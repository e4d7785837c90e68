"""Training: optimizers, densification, loops."""
