"""Column-level building blocks (native Catalyst expressions)."""
