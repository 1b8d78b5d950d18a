"""Optimizer API layer: optax GradientTransformation factories."""
