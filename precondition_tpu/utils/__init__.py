"""Shape metadata, quantized state, and small shared helpers."""
