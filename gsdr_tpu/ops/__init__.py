"""Functional DSP operations (jnp/XLA compute path).

Each module rebuilds one component of the reference op inventory
(SURVEY.md section 2.2) as an idiomatic jittable JAX function.
"""
