"""Pallas TPU kernels for the DSP hot path."""
