"""safevla_tpu — a TPU-native (JAX/XLA/Pallas) safe vision-language-action RL framework.

A from-scratch rebuild of the capability surface of PKU-Alignment/SafeVLA
(reference mounted read-only at /root/reference): constrained PPO-Lagrangian
fine-tuning of a VLA policy for a simulated Stretch robot, plus offline
imitation learning, evaluation harness, and the surrounding runtime.

Design (TPU-first, not a port):
  * All numeric compute is pure JAX under jit/pjit: frozen vision/text encoders,
    fusion transformer, LLaMA-style causal decoder with an explicit functional
    KV-cache, actor/critic heads, GAE, and the PPO-Lagrangian update.
  * The reference's three sequential "separate critic" towers
    (reference: architecture/models/allenact_transformer_models/separate_actor_critic.py)
    are executed as ONE vmapped computation over stacked tower params.
  * Scaling is mesh/sharding based (jax.sharding + XLA collectives over ICI)
    instead of NCCL process groups.
  * Everything that touches the AI2-THOR simulator stays host-side Python and
    streams observation batches to the device.
"""

__version__ = "0.1.0"
