from xf_flash_attention_cutlass_tpu.parallel.mesh import make_mesh  # noqa: F401
from xf_flash_attention_cutlass_tpu.parallel.tp import (  # noqa: F401
    param_partition_specs,
    shard_params,
    tp_forward,
    tp_loss_and_grad,
)
from xf_flash_attention_cutlass_tpu.parallel.ring import (  # noqa: F401
    ring_attention,
    ring_attention_zigzag,
    zigzag_permute,
    zigzag_unpermute,
)
from xf_flash_attention_cutlass_tpu.parallel.ulysses import ulysses_attention  # noqa: F401
from xf_flash_attention_cutlass_tpu.parallel.pp import (  # noqa: F401
    pp_forward,
    pp_loss_and_grad,
    shard_pp_params,
)
from xf_flash_attention_cutlass_tpu.parallel.pp_serve import (  # noqa: F401
    pp_decode_step,
    shard_pp_pools,
)
from xf_flash_attention_cutlass_tpu.parallel.ep import (  # noqa: F401
    moe_ep_forward,
    moe_ep_loss_and_grad,
    shard_moe_params,
)
