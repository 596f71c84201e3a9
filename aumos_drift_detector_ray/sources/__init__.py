"""Dataset sources/sinks (thin seams over ray.data readers/writers)."""
