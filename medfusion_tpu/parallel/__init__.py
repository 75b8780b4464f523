"""Device-mesh parallelism (the reference has none — SURVEY.md §2.4; this is
where the TPU rebuild exceeds it)."""

from medfusion_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    fsdp_partition_spec,
    make_mesh,
    model_partition_spec,
    replicated,
    shard_batch,
    shard_params,
)
from medfusion_tpu.parallel.moe import (  # noqa: F401
    MoEMLP,
    moe_aux_loss,
    moe_partition_spec,
)
from medfusion_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_apply,
    pipeline_partition_spec,
    shard_stage_params,
    stack_stage_params,
)
from medfusion_tpu.parallel.ring_attention import ring_attention  # noqa: F401
from medfusion_tpu.parallel.sampling import make_sharded_sampler  # noqa: F401
