"""TPU-tuned small-matrix kernels (batched tiny linear algebra)."""
