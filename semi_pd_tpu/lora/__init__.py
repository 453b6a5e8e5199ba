from semi_pd_tpu.lora.manager import LoRAManager

__all__ = ["LoRAManager"]
