"""Pallas TPU kernels; importing this package registers the "pallas" op backends."""
