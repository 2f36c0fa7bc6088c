"""Hot TPU kernels: vectorized field/point math, MSM, SpMV, folds.

This package is the device-side compute path (JAX/XLA/Pallas), replacing the
reference's halo2curves assembly + rayon inner loops (SURVEY.md §2.9).
"""
