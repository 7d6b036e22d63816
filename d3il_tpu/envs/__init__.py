"""Vectorized, jit/vmap-first task environments (reference envs/ L4)."""
