"""Tests for the progress display, including the distributed (ZMQ and
multiprocess) progress planes run in-process (mirrors
tests/progressbar_package_test.py strategy)."""

import io
import time

import pytest

from pyphysim_tpu.progressbar import (DummyProgressbar, ProgressbarText,
                                      ProgressbarText2, ProgressbarText3,
                                      ProgressbarMultiProcessServer,
                                      ProgressbarZMQClient,
                                      ProgressbarZMQServer)


class TestTextBars:
    def test_progress_render_and_finalize(self):
        out = io.StringIO()
        bar = ProgressbarText(100, message="hello", output=out)
        bar.progress(50)
        text = out.getvalue()
        assert "50%" in text
        assert "hello" in text
        bar.progress(100)
        assert out.getvalue().endswith("\n")
        # updates after finalization are ignored
        before = out.getvalue()
        bar.progress(40)
        assert out.getvalue() == before

    def test_display_throttle(self):
        out = io.StringIO()
        bar = ProgressbarText2(1000, output=out)
        bar.progress(1)
        first = out.getvalue()
        bar.progress(2)  # within 0.1s -> no new render
        assert out.getvalue() == first

    def test_count_style(self):
        out = io.StringIO()
        bar = ProgressbarText3(600, message="reps", output=out)
        bar.progress(400)
        assert "reps: 400/600" in out.getvalue()

    def test_eta_and_elapsed(self):
        bar = ProgressbarText2(100, output=io.StringIO())
        bar.progress(50)
        assert bar.elapsed_time is not None
        assert bar.eta is not None

    def test_dummy(self):
        DummyProgressbar(123, whatever="ignored").progress(5)

    def test_reference_timing_api(self):
        # progressbar.py:217-302: display_interval / elapsed_time_in_seconds
        # / get_eta(_in_seconds) / stop
        out = io.StringIO()
        bar = ProgressbarText(100, output=out)
        assert bar.display_interval == 0.1
        bar.display_interval = 0.5
        assert bar.display_interval == 0.5
        bar.progress(50)
        assert bar.elapsed_time_in_seconds >= 0.0
        assert bar.get_eta_in_seconds() >= 0.0
        assert isinstance(bar.get_eta(), str)
        bar.stop()
        before = out.getvalue()
        assert before.endswith("\n")
        bar.progress(80)  # ignored after stop
        assert out.getvalue() == before


class TestMultiProcessServer:
    def test_aggregation(self):
        server = ProgressbarMultiProcessServer(message="total",
                                               sleep_time=0.05)
        p1 = server.register_client_and_get_proxy_progressbar(100)
        p2 = server.register_client_and_get_proxy_progressbar(100)
        assert server.total_final_count == 200
        assert server.finalcount == 200       # progressbar.py:1209-1219
        assert server.num_clients == 2        # progressbar.py:1225-1228
        assert server.is_running is False     # progressbar.py:1221-1223
        server._bar = None
        p1.progress(60)
        p2(40)
        assert server._get_total_count() == 100


class TestZMQProgress:
    def test_zmq_roundtrip(self):
        pytest.importorskip("zmq")
        import socket as pysocket
        # pick a free port
        s = pysocket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()

        server = ProgressbarZMQServer(message="zmq", sleep_time=0.05,
                                      ip="127.0.0.1", port=port)
        c1 = server.register_client_and_get_proxy_progressbar(50)
        c2 = server.register_client_and_get_proxy_progressbar(50)
        assert isinstance(c1, ProgressbarZMQClient)
        assert (c1.client_id, c2.client_id) == (0, 1)
        server.start_updater()
        try:
            c1.progress(20)
            c2.progress(30)
            deadline = time.time() + 3.0
            while time.time() < deadline and \
                    server._get_total_count() < 50:
                time.sleep(0.05)
            assert server._get_total_count() == 50
        finally:
            server.stop_updater()

    def test_zmq_client_pickles(self):
        import pickle
        c = ProgressbarZMQClient(3, "localhost", 7396)
        c2 = pickle.loads(pickle.dumps(c))
        assert (c2.client_id, c2.ip, c2.port) == (3, "localhost", 7396)


class TestCenterMessage:
    def test_reference_doctest(self):
        from pyphysim_tpu.progressbar import center_message
        # reference progressbar.py:105-108 doctest
        assert center_message("Hello World", 50, "-", "Left", "Right") == \
            "Left-------------- Hello World --------------Right"

    def test_class_hierarchy(self):
        from pyphysim_tpu.progressbar import (
            ProgressbarDistributedClientBase, ProgressbarMultiProcessClient,
            ProgressbarText, ProgressbarText2, ProgressbarText3,
            ProgressbarTextBase, ProgressbarZMQClient)
        for cls in (ProgressbarText, ProgressbarText2, ProgressbarText3):
            assert issubclass(cls, ProgressbarTextBase)
        for cls in (ProgressbarMultiProcessClient, ProgressbarZMQClient):
            assert issubclass(cls, ProgressbarDistributedClientBase)


class TestCountProperty:
    def test_n_tracks_progress(self):
        bar = ProgressbarText(10, output=io.StringIO())
        assert bar.n == 0
        bar.progress(4)
        assert bar.n == 4
