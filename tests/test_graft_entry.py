"""Guards the driver contract: entry() shape-checks, dryrun executes."""

import os

import jax
import pytest

import __graft_entry__ as graft


def test_entry_is_jittable_shapewise():
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    assert out['embedding'].shape == (4, 14, 14, 128)
    assert out['nd_prototype'].shape == (2, 256, 128)
    assert out['finehrchy_cluster_index'].shape[0] == 4


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get('HSG_RUN_SLOW'),
                    reason='driver runs dryrun_multichip itself; set '
                           'HSG_RUN_SLOW=1 to include it in pytest')
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
