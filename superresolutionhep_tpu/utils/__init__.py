"""Host-side utilities (allocator tuning, small runtime helpers)."""
