"""Neural network models (CREPE pitch CNN, BUT/Phonexia bottleneck
MLPs) as pure-JAX forward passes."""
