"""Compute ops for the TPU color-transfer pipeline."""
