from tpgan_tpu.utils.misc import scale_channels

__all__ = ["scale_channels"]
