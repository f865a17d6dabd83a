"""Differentiable & inverse rendering.

The capability the reference does NOT have (SURVEY.md §7.1 "New"):
end-to-end autodiff of rendered radiance w.r.t. material and light
parameters, built on detached-sampling gradients (differentiate the
estimator, not the sampler) and plain ``jax.grad`` through the wavefront.
"""

from bifrost3d_tpu.diff.render_grad import (
    render_loss_grad,
    image_l2_loss,
    optimize_materials,
)
from bifrost3d_tpu.diff.mesh_edge_grad import (
    MeshEdges,
    edge_translation_gradient,
)
