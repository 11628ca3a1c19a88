"""First-party TPU compute ops: fused preprocessing and Pallas conv kernels."""
