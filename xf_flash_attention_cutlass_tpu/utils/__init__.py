from xf_flash_attention_cutlass_tpu.utils.platform import (  # noqa: F401
    cdiv,
    default_interpret,
    next_multiple,
    on_tpu,
)
