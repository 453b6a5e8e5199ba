from semi_pd_tpu.sampling.sampling_params import SamplingParams

__all__ = ["SamplingParams"]
