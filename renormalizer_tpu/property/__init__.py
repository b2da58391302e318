from renormalizer_tpu.property.property import Property
