"""Pallas TPU kernels for the hot non-conv paths (NMS, fused GroupNorm)."""
