"""Run the tutorial examples end-to-end (the TEST_examples analogue)."""

import ex1_struct_smg
import ex3_struct_pfmg_pcg
import ex5_ij_amg_pcg
import ex9_sstruct_split
import ex11_lobpcg
import ex15_ams

for mod in (
    ex1_struct_smg,
    ex3_struct_pfmg_pcg,
    ex5_ij_amg_pcg,
    ex9_sstruct_split,
    ex11_lobpcg,
    ex15_ams,
):
    mod.main()
print("all examples passed")
