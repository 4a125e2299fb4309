"""Experiment-directory maintenance & completeness tools (the reference's
``global_utils/`` side rail)."""
