from .predictor import StandardPredictor, get_predictor, remove_halo

__all__ = ["StandardPredictor", "get_predictor", "remove_halo",
           "export_eval", "serving_forward"]


def __getattr__(name):  # lazy: jax.export only loads when serving-export is used
    if name in ("export_eval", "serving_forward", "load_exported",
                "save_exported", "make_eval_fn"):
        from . import export as _export
        return getattr(_export, name)
    raise AttributeError(name)
