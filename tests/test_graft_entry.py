"""Driver contract: dryrun_multichip runs a real dp x tp sharded step."""

import sys


def test_dryrun_multichip_8(capsys):
    sys.path.insert(0, ".")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "step ok" in out
    assert "'data': 4" in out and "'model': 2" in out
