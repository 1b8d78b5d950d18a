"""Online convex optimization benchmark harness (Sketchy App. A style)."""
