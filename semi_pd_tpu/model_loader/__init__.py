from semi_pd_tpu.model_loader.loader import load_params, iterate_hf_weights

__all__ = ["load_params", "iterate_hf_weights"]
