from hypre_tpu.amg.boomeramg import BoomerAMG
