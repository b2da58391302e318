from renormalizer_tpu.ops import contract
