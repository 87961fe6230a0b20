"""The legacy nnet2 p-norm multisplice TDNN (DNN/i-vector posterior net).

Replaces the reference's nnet2 acoustic model used by the DNN/i-vector
recipe (`run_sre10_nnet2.sh:96-108` via
`local/dnn/run_nnet2_multisplice.sh:47-61` and
`sid/nnet2/train_multisplice_accel2.sh`): a multisplice TDNN with p-norm
nonlinearities, splice indexes

    layer0: -2:-1:0:1:2   layer1: -1,2   layer3: -3,3   layer4: -7,2

and pnorm 3500 -> 350 (group size 10, p=2), softmax over senones.  Its
only role in the pipeline is supplying senone posteriors for the
DNN-posterior UBM/i-vector (`init_full_ubm_from_dnn.sh:100-105`), which
plug into `recipes.ivector_recipe.train_v1_frontend(posterior_fn=...)`.

The p-norm unit (Zhang et al. 2014): y_j = (sum_{i in group j} |x_i|^p)
^(1/p), followed by renormalization to unit RMS (nnet2's
NormalizeComponent).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .tdnn import Stream, TdnnSpec, stack_context


class PnormLayer(nn.Module):
    """affine (spliced conv1d) -> group p-norm -> RMS normalize."""

    spec: TdnnSpec  # spec.dim = pnorm OUTPUT dim
    input_dim_multiple: int = 10  # affine outputs dim * group_size
    p: float = 2.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.spec
        group = self.input_dim_multiple
        affine = nn.Conv(
            features=s.dim * group,
            kernel_size=(s.kernel_size,),
            kernel_dilation=(s.dilation,),
            padding="VALID",
            name="affine",
        )(x)
        b, t, _ = affine.shape
        g = affine.reshape(b, t, s.dim, group)
        if self.p == 2.0:
            y = jnp.sqrt(jnp.sum(g * g, axis=-1) + 1e-20)
        else:
            y = jnp.sum(jnp.abs(g) ** self.p, axis=-1) ** (1.0 / self.p)
        # NormalizeComponent: scale rows to unit RMS
        rms = jnp.sqrt(jnp.mean(y * y, axis=-1, keepdims=True) + 1e-20)
        return y / rms


@dataclasses.dataclass(frozen=True)
class Nnet2Config:
    """The run_nnet2_multisplice.sh architecture on 40-dim hires MFCC."""

    feat_dim: int = 40
    num_senones: int = 4000
    pnorm_output_dim: int = 350  # reference: 3500 -> 350 (group 10)
    group_size: int = 10
    specs: Tuple[TdnnSpec, ...] = (
        TdnnSpec(350, (-2, -1, 0, 1, 2)),  # layer0
        TdnnSpec(350, (-1, 2)),  # layer1 "-1:2"
        TdnnSpec(350, (0,)),  # layer2 (no splice)
        TdnnSpec(350, (-3, 3)),  # layer3
        TdnnSpec(350, (-7, 2)),  # layer4
    )

    @property
    def context(self) -> Tuple[int, int]:
        return stack_context(self.specs)  # (13, 9)


NNET2_MULTISPLICE = Nnet2Config()


class Nnet2Multisplice(nn.Module):
    cfg: Nnet2Config

    @nn.compact
    def __call__(self, feats: jnp.ndarray, train: bool = False):
        x = feats
        left = right = 0
        for i, spec in enumerate(self.cfg.specs):
            spec = dataclasses.replace(spec, dim=self.cfg.pnorm_output_dim)
            x = PnormLayer(spec, self.cfg.group_size, name=f"layer{i}")(x)
            left += spec.left
            right += spec.right
        logits = nn.Dense(self.cfg.num_senones, name="output")(x)
        return {"logits": logits, "context": (left, right), "stream": Stream(x, left, right)}
