"""L0 ops: Pallas TPU kernels with XLA fallbacks.

Every CUDA/Triton/native kernel in the reference gets a TPU-native
equivalent here (SURVEY.md §2.8). XLA fallbacks keep everything CPU-testable.
"""
