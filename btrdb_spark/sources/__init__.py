"""Table readers and the events->points mapping."""
