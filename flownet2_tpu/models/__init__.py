"""The FlowNet model family as functional JAX programs.

Every net is a pair of pure functions — ``init_params(key) -> pytree`` and
``apply(params, inputs) -> {scale: flow}`` — over NHWC tensors; the whole
cascade compiles to one XLA program under jit (replacing the reference's
prototxt-interpreted layer graph, SURVEY.md §2.6/§3.1).

Architecture facts (conv stacks, channel counts, div_flow=20 scaling, fusion
input wiring) follow the published FlowNet / FlowNet 2.0 papers (CVPR15/17,
cited at reference README.md:15-22) and the released deploy templates; the
prototxts themselves are not in the reference tree (models/download-models.sh).
"""

from flownet2_tpu.models.dispnet import dispnet_c_init, dispnet_c_apply
from flownet2_tpu.models.flownet_s import flownet_s_init, flownet_s_apply
from flownet2_tpu.models.flownet_c import flownet_c_init, flownet_c_apply
from flownet2_tpu.models.flownet_sd import flownet_sd_init, flownet_sd_apply
from flownet2_tpu.models.fusion import fusion_init, fusion_apply
from flownet2_tpu.models.flownet2 import (
    DIV_FLOW,
    flownet2_init,
    flownet2_apply,
    flownet2_css_apply,
    flownet2_cs_apply,
    normalize_images,
)

__all__ = [
    "dispnet_c_init",
    "dispnet_c_apply",
    "flownet_s_init",
    "flownet_s_apply",
    "flownet_c_init",
    "flownet_c_apply",
    "flownet_sd_init",
    "flownet_sd_apply",
    "fusion_init",
    "fusion_apply",
    "flownet2_init",
    "flownet2_apply",
    "flownet2_css_apply",
    "flownet2_cs_apply",
    "normalize_images",
    "DIV_FLOW",
]
