"""Pipeline stages — each a vectorized callable for ``Dataset.map_batches``."""
