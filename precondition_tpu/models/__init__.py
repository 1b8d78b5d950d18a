"""Demo model families driven by the preconditioned optimizers."""
