"""superresolutionhep_tpu — TPU-native framework for denoising graph super-resolution
and particle-flow reconstruction in collider calorimetry.

A ground-up JAX/XLA/Pallas re-design with the capability surface of the reference
research codebase (etiennedreyer/SuperResolutionHEP):

  * Stage 1 (SR): conditional flow-matching diffusion transformer that predicts
    high-resolution calorimeter cell energies from low-resolution measured cells.
  * Stage 2 (PF): set-to-set transformer predicting particle cardinality,
    kinematics and cell->particle energy incidence.

Design stance (TPU-first, not a port):
  * pure-functional flax models, static shapes, length-bucketed padded batching
  * `lax.scan` ODE samplers with the ensemble folded into the batch axis
  * on-device exhaustive Hungarian matching (max_particles <= 8)
  * Pallas masked flash attention for the hot O(N^2) kernel
  * `jax.sharding.Mesh` data/sequence parallelism over ICI
  * Orbax checkpointing (best-k + last), JSONL metrics sink
"""

__version__ = "0.1.0"
