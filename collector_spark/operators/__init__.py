"""DataFrame-transform operators (the reference's "processors",
plus the relational/training-data operators the reference lacks)."""
