"""Re-export of the package's synthetic scenario builder (kept at the
historical test-local import path ``synthetic``)."""

from mica_tpu.utils.synthetic import (  # noqa: F401
    AA_LETTERS,
    _add_bump,
    make_chain,
    make_multichain_volumes,
    make_scenario,
    random_rigid,
)
