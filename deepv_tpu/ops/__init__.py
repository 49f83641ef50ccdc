"""Core compute ops: functional layers, resampling, RoPE, noise, attention.

The hot paths (packed masked attention, causal 3D convolution) have Pallas
TPU kernels; everything else is expressed so XLA fuses it into adjacent
matmuls (elementwise modulation, norms, activations).
"""
