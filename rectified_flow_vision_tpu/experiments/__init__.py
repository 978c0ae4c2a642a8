"""Experiment entry points: train_base, train_rectified, benchmark."""
