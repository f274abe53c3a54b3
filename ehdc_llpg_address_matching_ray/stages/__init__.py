"""Ray Data stages: each module exposes batch/group functions or callable
actor classes designed for ``Dataset.map_batches`` / ``groupby``."""
