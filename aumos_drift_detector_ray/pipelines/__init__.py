"""End-to-end pipelines: flagship image validation + drift run, and the
generic table pipelines exercised by the driver correctness gate."""
