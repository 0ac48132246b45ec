"""The driver-contract module must never hang on a down TPU tunnel.

dryrun_multichip decides whether to re-exec into a virtual CPU mesh
BEFORE touching jax.devices(): on the axon runtime a down tunnel makes
the device query block indefinitely inside the plugin, which would turn
the driver's multi-chip contract check into a hang during an outage.
The decision predicate is pure-environment and tested here.
"""

import sys


def _predicate(monkeypatch, pool_ips, platforms):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    if pool_ips is None:
        monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    else:
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", pool_ips)
    if platforms is None:
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    else:
        monkeypatch.setenv("JAX_PLATFORMS", platforms)
    return g._axon_pending()


def test_axon_pending_when_pool_ips_set(monkeypatch):
    # axon registration pending -> must re-exec without querying devices
    assert _predicate(monkeypatch, "10.0.0.1", None) is True
    assert _predicate(monkeypatch, "10.0.0.1", "axon") is True


def test_not_pending_when_cpu_pinned_or_no_pool(monkeypatch):
    # CPU-pinned or no axon pool: jax.devices() is safe to consult
    assert _predicate(monkeypatch, "10.0.0.1", "cpu") is False
    assert _predicate(monkeypatch, "", None) is False
    assert _predicate(monkeypatch, None, None) is False
