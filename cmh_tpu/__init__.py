"""tpu-cmhash: TPU-native CLIP-based cross-modal hashing framework.

Importing the package registers all datasets, models (methods), optimizers,
tokenizers, and runners into the global registry (same dispatch pattern as
the reference's package-level star imports in main.py:4-8).
"""

from . import config, registry  # noqa: F401
from .registry import registry as global_registry  # noqa: F401


def register_all() -> None:
    """Import every registrable component (idempotent)."""
    from .data import builder, dataset  # noqa: F401
    from .models import baseline, dcmht, dimch, dnph, dsph, mith, twdh, umoed  # noqa: F401
    from .models.clip import tokenizer  # noqa: F401
    from .optim import bert_adam  # noqa: F401
    from .runners import base  # noqa: F401
    from .runners import baseline as baseline_runner  # noqa: F401
    from .runners import dcmht as dcmht_runner  # noqa: F401
    from .runners import dnph as dnph_runner  # noqa: F401
    from .runners import dsph as dsph_runner  # noqa: F401
    from .runners import mith as mith_runner  # noqa: F401
    from .runners import dimch as dimch_runner  # noqa: F401
    from .runners import twdh as twdh_runner  # noqa: F401
    from .runners import umoed as umoed_runner  # noqa: F401


register_all()
