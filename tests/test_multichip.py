"""Multichip dryrun variants as tests (opt-in slow).

The driver itself runs ``dryrun_multichip(8)`` (slim widths) every round;
this file adds the REAL-WIDTH 2-device variant (VERDICT r2 item 7): hidden
768 fusion / embed-128 swin with the real head counts under FSDP, at small
spatial size so the single-core virtual mesh stays inside XLA's 40s
collective-rendezvous budget. Catches width-dependent sharding bugs (e.g.
uneven head splits) the slim run cannot.

Run: python -m pytest tests/test_multichip.py -m slow -q   (several minutes)
"""

import pytest

import tests.conftest  # noqa: F401


@pytest.mark.slow
def test_dryrun_realwidth_two_devices():
    import __graft_entry__ as ge
    ge.dryrun_multichip(2, width="real")
