"""Test-side alias for the reference-framework compat shims.

The implementation lives in ``cmh_tpu/tools/ref_compat.py`` (it is also the
backbone of the epoch A/B benchmark tool); tests import it through this
module so test files need no package-path knowledge.
"""

from cmh_tpu.tools.ref_compat import (  # noqa: F401
    REFERENCE_ROOT,
    cuda_noop,
    install_stubs,
    load_reference,
)
