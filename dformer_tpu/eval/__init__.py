from dformer_tpu.eval.evaluate import Evaluator, slide_window_grid
