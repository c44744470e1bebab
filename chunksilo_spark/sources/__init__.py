"""Sources: deterministic corpus synthesis + table storage abstraction."""
