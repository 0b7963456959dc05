"""Multi-host cluster spec resolution (parity:
/root/reference/neurst/training/distribution_utils.py:151-169 —
WORKER_HOSTS/TASK_ID env -> TF_CONFIG; here -> jax.distributed kwargs).
"""

import pytest

from neurst_tpu.parallel.cluster import resolve_cluster


def test_no_spec_means_auto_discovery():
    assert resolve_cluster(env={}) == {}
    assert resolve_cluster(worker_hosts=None, task_index=None, env={}) == {}


def test_flags_take_precedence_over_env():
    kwargs = resolve_cluster(
        worker_hosts="a:1,b:2", task_index=1,
        env={"WORKER_HOSTS": "x:9,y:9", "TASK_ID": "0"})
    assert kwargs == {"coordinator_address": "a:1",
                      "num_processes": 2, "process_id": 1}


def test_env_fallback():
    kwargs = resolve_cluster(
        env={"WORKER_HOSTS": "h1:1234,h2:1234,h3:1234", "TASK_ID": "2"})
    assert kwargs == {"coordinator_address": "h1:1234",
                      "num_processes": 3, "process_id": 2}


def test_single_worker_defaults_task_zero():
    kwargs = resolve_cluster(env={"WORKER_HOSTS": "solo:555"})
    assert kwargs == {"coordinator_address": "solo:555",
                      "num_processes": 1, "process_id": 0}


def test_missing_task_index_raises():
    with pytest.raises(ValueError, match="task_index"):
        resolve_cluster(env={"WORKER_HOSTS": "a:1,b:2"})


def test_out_of_range_task_index_raises():
    with pytest.raises(ValueError, match="out of range"):
        resolve_cluster(worker_hosts="a:1,b:2", task_index=5, env={})


def test_coordinator_port_defaulted():
    kwargs = resolve_cluster(worker_hosts="bare-host", env={})
    assert kwargs["coordinator_address"] == "bare-host:8476"
