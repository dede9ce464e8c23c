from hypre_tpu.amg.boomeramg import BoomerAMG
from hypre_tpu.amg.smoothed_agg import SmoothedAggAMG
