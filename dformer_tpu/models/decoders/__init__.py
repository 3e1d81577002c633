from dformer_tpu.models.decoders.ham import LightHamHead
from dformer_tpu.models.decoders.mlp import MLPDecoderHead
from dformer_tpu.models.decoders.fcn import FCNHead
from dformer_tpu.models.decoders.upernet import UPerHead
from dformer_tpu.models.decoders.deeplabv3p import DeepLabV3Plus
from dformer_tpu.models.decoders.nl import NLHead
