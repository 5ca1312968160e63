"""Vector similarity search over embedding columns (``array<float>``)."""
