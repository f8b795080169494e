from .inference import (inference_detector, init_model, make_predict_fn,
                        results_to_host)
from .test import run_test
from .train import train_model

__all__ = ['inference_detector', 'init_model', 'make_predict_fn',
           'results_to_host', 'run_test',
           'train_model']
