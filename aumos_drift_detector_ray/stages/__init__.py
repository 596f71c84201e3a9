"""Ray Data pipeline stages: profiling, validation, drift scoring,
dedup, text analysis, similarity search, concept-drift streaming."""
