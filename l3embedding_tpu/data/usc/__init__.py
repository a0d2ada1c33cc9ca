"""Downstream urban-sound-classification datasets: feature computation,
folds, and per-dataset generators (US8K / ESC-50 / DCASE2013 SCD)."""
