"""map_batches stages: extraction kernels, dedup, text stats, similarity."""
