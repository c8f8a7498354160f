"""Benchmark CLIs mirroring the reference demo apps (SURVEY.md §6).

Each module is runnable as ``python -m wave_fenics_tpu.benchmarks.<name>``
and prints one JSON result line:

- ``tsmm``            — batched contraction pair (gpu_tsmm)
- ``operators_bench`` — matvec DOF/s: mass/spectral/stiffness
                        (gpu_operator, gpu_operator_monolithic,
                        gpu_spectral_mass)
- ``cg_bench``        — CG Dofs*iteration/s (gpu_cg / CEED BP1)
- ``scatter_bench``   — gather/scatter + halo exchange
                        (gpu_scatter_local, gpu_scatter_mpi)
- ``planar3d_bench``  — the headline RK4 solve (cpu_planar3d): see bench.py
"""
