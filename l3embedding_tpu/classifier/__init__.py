"""Downstream classification: JAX MLP + sklearn SVM/RF, hyperparameter
search, fold-level evaluation and metrics."""
