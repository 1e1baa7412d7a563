from streamingt2v_tpu.ops.attention import attention, dot_product_attention  # noqa: F401
from streamingt2v_tpu.ops.blend import alpha_blend, blend_weight  # noqa: F401
from streamingt2v_tpu.ops.embedding import timestep_embedding  # noqa: F401
from streamingt2v_tpu.ops.norms import group_norm, layer_norm  # noqa: F401
