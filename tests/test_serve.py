"""Serving layer: the JSON-over-HTTP veneer over the CLI (mcport/serve.py).

Drives a REAL server (stdlib HTTPServer on a random localhost port, served
from a thread) through urllib — request translation, command execution,
error surfaces, and the sequential request lock all execute for real. The
engine outputs themselves are pinned by test_cli.py; here the contract is
"POST /v1/<command> == the CLI" plus HTTP semantics.
"""

import json
import threading
import urllib.error
import urllib.request

import pytest

from mcport.serve import build_argv, make_server


# ---- argv translation (pure) ------------------------------------------------


def test_build_argv_translation():
    argv = build_argv(
        "path-risk", ["a.csv", "b.csv"],
        {"paths": 4096, "no_pallas": True, "hedge": None, "resume": False,
         "models": "garch,bootstrap", "view": ["A:0.1", "B:0.2"]})
    assert argv == ["path-risk", "a.csv", "b.csv", "--paths", "4096",
                    "--no-pallas", "--models", "garch,bootstrap",
                    "--view", "A:0.1", "--view", "B:0.2"]


def test_build_argv_accepts_dashed_keys():
    assert build_argv("stats", None, {"--risk-free": 0.02}) == [
        "stats", "--risk-free", "0.02"]


# ---- live server -------------------------------------------------------------


@pytest.fixture(scope="module")
def server_url():
    server = make_server("127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()
    server.server_close()
    thread.join(timeout=10)


def _get(url: str):
    with urllib.request.urlopen(url, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


def _post(url: str, body: dict):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=600) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def test_health_and_commands(server_url):
    status, body = _get(server_url + "/health")
    assert status == 200 and body["status"] == "ok"
    assert body["backend"] == "cpu"  # conftest forces CPU in this tier
    status, commands = _get(server_url + "/v1/commands")
    assert status == 200
    for cmd in ("stats", "path-risk", "dd-frontier", "forecast", "backtest"):
        assert cmd in commands
    assert "serve" not in commands  # no recursive serving
    assert body["commands"] == len(commands)


def test_stats_matches_cli(server_url, fixtures_dir):
    csv = str(fixtures_dir / "ETH_USD 7 Years Weekly.csv")
    status, body = _post(server_url + "/v1/stats",
                         {"args": [csv], "options": {"period": "W"}})
    assert status == 200 and body["period"] == "W"

    import contextlib
    import io

    from mcport.cli import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["stats", csv, "--period", "W"])
    assert body == json.loads(buf.getvalue())


def test_gbm_risk_serves_and_warm_repeat(server_url, fixtures_dir):
    csv = str(fixtures_dir / "ETH_USD 7 Years Weekly.csv")
    req = {"args": [csv], "options": {"period": "W", "paths": 1024,
                                      "steps": 4, "no-pallas": True}}
    status, first = _post(server_url + "/v1/gbm-risk", req)
    assert status == 200 and first["cvar"] <= first["var"]
    # the serve-many point: the second identical query reuses the compiled
    # graph in the SAME process and must be bit-identical
    status, second = _post(server_url + "/v1/gbm-risk", req)
    assert status == 200 and second == first


def test_unknown_command_404(server_url):
    status, body = _post(server_url + "/v1/nope", {})
    assert status == 404 and "unknown command" in body["error"]
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(server_url + "/health/extra")
    assert exc.value.code == 404


def test_bad_arguments_400_and_server_survives(server_url):
    status, body = _post(server_url + "/v1/stats",
                         {"options": {"period": "W"}})  # missing csv arg
    assert status == 400 and body["error"] == "bad arguments"
    assert "usage" in body["detail"]
    status, body = _post(server_url + "/v1/stats",
                         {"args": ["/nonexistent.csv"]})
    assert status == 400 and "error" in body
    # still serving after both failures
    assert _get(server_url + "/health")[0] == 200


def test_idle_keepalive_client_does_not_starve_others(server_url):
    """HTTP/1.1 keep-alive is the default for pooled clients: a client that
    sends one request and then holds its connection open idle must NOT block
    other clients (the single-connection HTTPServer failure mode — the
    handler sits in readline() waiting for the idle client's next request)."""
    import socket

    hostport = server_url.removeprefix("http://")
    host, port = hostport.rsplit(":", 1)
    with socket.create_connection((host, int(port)), timeout=30) as sock:
        sock.sendall(b"GET /health HTTP/1.1\r\nHost: x\r\n"
                     b"Connection: keep-alive\r\n\r\n")
        assert sock.recv(65536).startswith(b"HTTP/1.1 200")
        # connection stays open and idle; a second client must get through
        status, body = _get(server_url + "/health")
        assert status == 200 and body["status"] == "ok"


def test_string_systemexit_message_lands_in_detail(server_url, fixtures_dir):
    """CLI guards that `raise SystemExit("msg")` keep the message in
    exc.code (never printed inside the server process) — the 400 detail must
    carry it, not come back empty."""
    csv = str(fixtures_dir / "ETH_USD 7 Years Weekly.csv")
    status, body = _post(
        server_url + "/v1/gbm-risk",
        {"args": [csv], "options": {"weights": "0.5,0.5", "period": "W"}})
    assert status == 400 and body["error"] == "bad arguments"
    assert "--weights needs 1 entries" in body["detail"]


def test_non_object_body_400(server_url):
    req = urllib.request.Request(
        server_url + "/v1/stats", data=b"[1, 2]", method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            status = resp.status
    except urllib.error.HTTPError as err:
        status = err.code
    assert status == 400


def test_metrics_endpoint_counts_requests(server_url, fixtures_dir):
    csv = str(fixtures_dir / "ETH_USD 7 Years Weekly.csv")
    _post(server_url + "/v1/stats", {"args": [csv], "options": {"period": "W"}})
    _post(server_url + "/v1/stats", {"options": {}})       # 400: missing csv
    status, m = _get(server_url + "/metrics")
    assert status == 200 and m["requests"] >= 2
    stats_m = m["commands"]["stats"]
    assert stats_m["count"] >= 2 and stats_m["errors"] >= 1
    assert stats_m["total_wall_s"] >= stats_m["last_wall_s"] >= 0.0
