"""Host-side utilities: dataset I/O, config, evaluation, synthetic scenes."""
