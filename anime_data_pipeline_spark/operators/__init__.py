"""Domain operators: bucketing, tag ordering, dedup, similarity, text."""
