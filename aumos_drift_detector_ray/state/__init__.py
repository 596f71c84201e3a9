"""Stateful components: streaming concept-drift detectors and
checkpoint/lineage records."""
