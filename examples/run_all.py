"""Run the tutorial examples end-to-end (the TEST_examples analogue)."""

import ex1_struct_smg
import ex2_struct_twobox
import ex3_struct_pfmg_pcg
import ex4_struct_varcoef
import ex5_ij_amg_pcg
import ex6_sstruct_twobox
import ex7_sstruct_convection
import ex8_sstruct_multipart
import ex9_sstruct_split
import ex10_fei_fem
import ex11_lobpcg
import ex12_sstruct_nodal
import ex13_star_domain
import ex14_sstruct_fem_star
import ex15_ams
import ex16_q3_fem
import ex17_ndim_laplacian
import ex18_sstruct_ndim

for mod in (
    ex1_struct_smg,
    ex2_struct_twobox,
    ex3_struct_pfmg_pcg,
    ex4_struct_varcoef,
    ex5_ij_amg_pcg,
    ex6_sstruct_twobox,
    ex7_sstruct_convection,
    ex8_sstruct_multipart,
    ex9_sstruct_split,
    ex10_fei_fem,
    ex11_lobpcg,
    ex12_sstruct_nodal,
    ex13_star_domain,
    ex14_sstruct_fem_star,
    ex15_ams,
    ex16_q3_fem,
    ex17_ndim_laplacian,
    ex18_sstruct_ndim,
):
    mod.main()
print("all examples passed")
