"""Compatibility bridges to the reference stack's artifacts (Keras .h5
weight files)."""
