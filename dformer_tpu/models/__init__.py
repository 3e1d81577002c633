from dformer_tpu.models.builder import EncoderDecoder, build_model
