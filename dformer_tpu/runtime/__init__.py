from dformer_tpu.runtime.engine import Engine
from dformer_tpu.runtime.logger import get_logger
