"""Composite operators: deduplication, similarity search, text analysis,
multimodal columns, as-of joins. Each module documents its 100 TB execution
strategy (shuffle keys, broadcast choices, what stays JVM-side)."""
