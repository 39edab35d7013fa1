"""Serving layer: micro-batching coalescer + HTTP endpoint (new capability —
the reference has no serving story)."""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from vtamiq_tpu.serving import MicroBatcher, ScoringServer, _batch_ladder


class FakeScorer:
    """Records batch compositions; returns the per-pair mean difference."""

    def __init__(self, delay=0.0):
        self.batches = []
        self.delay = delay

    def score_batch(self, refs, dists):
        self.batches.append(len(refs))
        if self.delay:
            time.sleep(self.delay)
        return np.asarray([float(np.mean(r - d)) for r, d in zip(refs, dists)])


def make_pair(rng, value, size=(8, 8)):
    ref = np.full(size + (3,), 0.5, np.float32)
    dist = ref - np.float32(value)
    return ref, dist


class TestBatchLadder:
    def test_powers_of_two(self):
        assert _batch_ladder(16) == [1, 2, 4, 8, 16]

    def test_non_power_max(self):
        assert _batch_ladder(6) == [1, 2, 4, 6]

    def test_one(self):
        assert _batch_ladder(1) == [1]


class TestMicroBatcher:
    def test_single_request(self):
        fake = FakeScorer()
        mb = MicroBatcher(fake, max_batch=4, max_wait_ms=1.0).start()
        try:
            ref, dist = make_pair(None, 0.125)
            assert mb.score(ref, dist, timeout=10) == pytest.approx(0.125)
            assert fake.batches == [1]
        finally:
            mb.stop()

    def test_coalesces_concurrent_requests(self):
        fake = FakeScorer(delay=0.05)
        mb = MicroBatcher(fake, max_batch=8, max_wait_ms=50.0).start()
        try:
            vals = [i / 100.0 for i in range(6)]
            futs = [mb.submit(*make_pair(None, v)) for v in vals]
            got = [f.result(10) for f in futs]
            assert got == pytest.approx(vals)
            # 6 requests -> ladder pads to 8; one or two device batches, not 6
            assert len(fake.batches) <= 2
            assert mb.stats["served"] == 6
        finally:
            mb.stop()

    def test_ladder_padding_counted(self):
        fake = FakeScorer(delay=0.05)
        mb = MicroBatcher(fake, max_batch=8, max_wait_ms=50.0).start()
        try:
            futs = [mb.submit(*make_pair(None, 0.01 * i)) for i in range(3)]
            [f.result(10) for f in futs]
            # 3 requests in one flush -> padded to ladder size 4
            if len(fake.batches) == 1:
                assert fake.batches[0] == 4
                assert mb.stats["padded_slots"] == 1
        finally:
            mb.stop()

    def test_mixed_sizes_grouped(self):
        fake = FakeScorer(delay=0.05)
        mb = MicroBatcher(fake, max_batch=8, max_wait_ms=50.0).start()
        try:
            f1 = mb.submit(*make_pair(None, 0.1, size=(8, 8)))
            f2 = mb.submit(*make_pair(None, 0.2, size=(16, 8)))
            assert f1.result(10) == pytest.approx(0.1)
            assert f2.result(10) == pytest.approx(0.2)
            assert mb.stats["served"] == 2
        finally:
            mb.stop()

    def test_timed_out_request_not_scored(self):
        """score() cancels its future on timeout; the dispatcher drops
        cancelled entries before paying a device batch (ADVICE r2)."""
        fake = FakeScorer()
        mb = MicroBatcher(fake, max_batch=4, max_wait_ms=1.0)  # NOT started
        ref, dist = make_pair(None, 0.25)
        with pytest.raises(Exception):  # concurrent.futures.TimeoutError
            mb.score(ref, dist, timeout=0.05)
        mb.start()
        try:
            # live request after the abandoned one: the device batch contains
            # only the live pair (the cancelled one is dropped, not padded in)
            assert mb.score(ref, dist, timeout=10) == pytest.approx(0.25)
            assert fake.batches == [1]
            assert mb.stats["served"] == 1
        finally:
            mb.stop()

    def test_all_cancelled_group_skips_device(self):
        fake = FakeScorer()
        mb = MicroBatcher(fake, max_batch=4, max_wait_ms=1.0)
        fut = mb.submit(*make_pair(None, 0.1))
        fut.cancel()
        mb.start()
        try:
            time.sleep(0.3)
            assert fake.batches == []
        finally:
            mb.stop()

    def test_scorer_error_propagates(self):
        class Boom:
            def score_batch(self, refs, dists):
                raise RuntimeError("device fell over")

        mb = MicroBatcher(Boom(), max_batch=2, max_wait_ms=1.0).start()
        try:
            fut = mb.submit(*make_pair(None, 0.1))
            with pytest.raises(RuntimeError, match="device fell over"):
                fut.result(10)
            assert mb.stats["errors"] == 1
        finally:
            mb.stop()

    def test_warmup_compiles_ladder(self):
        fake = FakeScorer()
        mb = MicroBatcher(fake, max_batch=8)
        mb.warmup(8, 8)
        assert fake.batches == [1, 2, 4, 8]  # one call per ladder size
        mb.warmup(8, 8, batch_sizes=[2])
        assert fake.batches[-1] == 2

    def test_shape_mismatch_rejected(self):
        mb = MicroBatcher(FakeScorer(), max_batch=2)
        ref, _ = make_pair(None, 0.1, size=(8, 8))
        _, dist = make_pair(None, 0.1, size=(16, 8))
        with pytest.raises(ValueError, match="!="):
            mb.submit(ref, dist)

    def test_full_queue_rejects_fast(self):
        from vtamiq_tpu.serving import QueueFullError
        mb = MicroBatcher(FakeScorer(), max_batch=2, max_queue=2)  # not started
        ref, dist = make_pair(None, 0.1)
        mb.submit(ref, dist)
        mb.submit(ref, dist)
        with pytest.raises(QueueFullError):
            mb.submit(ref, dist)
        assert mb.stats["rejected"] == 1

    def test_restrict_to_warmed_rejects_novel_shape(self):
        from vtamiq_tpu.serving import UnknownShapeError
        fake = FakeScorer()
        mb = MicroBatcher(fake, max_batch=2, restrict_to_warmed=True)
        ref, dist = make_pair(None, 0.1, size=(8, 8))
        with pytest.raises(UnknownShapeError):
            mb.submit(ref, dist)
        mb.warmup(8, 8, batch_sizes=[1])
        mb.start()
        try:
            assert mb.score(ref, dist, timeout=10) == pytest.approx(0.1)
            with pytest.raises(UnknownShapeError):
                mb.submit(*make_pair(None, 0.1, size=(16, 16)))
        finally:
            mb.stop()

    def test_stop_resolves_pending_futures(self):
        mb = MicroBatcher(FakeScorer(), max_batch=2)  # dispatcher NOT started
        fut = mb.submit(*make_pair(None, 0.1))
        mb.stop()
        with pytest.raises(RuntimeError, match="stopped"):
            fut.result(5)

    def test_cancelled_future_does_not_poison_batch(self):
        fake = FakeScorer(delay=0.2)
        mb = MicroBatcher(fake, max_batch=4, max_wait_ms=100.0).start()
        try:
            f1 = mb.submit(*make_pair(None, 0.1))
            f2 = mb.submit(*make_pair(None, 0.2))
            f2.cancel()  # races the dispatcher; either cancelled or scored
            assert f1.result(10) == pytest.approx(0.1)
            assert mb.stats["errors"] == 0
        finally:
            mb.stop()

    def test_cancel_landing_mid_resolve_does_not_poison_batch(self):
        """The narrow race: cancel() lands BETWEEN the dispatcher's done()
        check and set_result. Simulated with a future whose set_result
        raises InvalidStateError — the sibling future must still resolve
        and the dispatcher thread must survive."""
        from concurrent.futures import InvalidStateError

        class MidResolveCancel:
            done = cancelled = staticmethod(lambda: False)

            def set_result(self, *_):
                raise InvalidStateError("cancelled mid-resolve")

            def set_exception(self, *_):
                raise InvalidStateError("cancelled mid-resolve")

        fake = FakeScorer()
        mb = MicroBatcher(fake, max_batch=4)
        r, d = make_pair(None, 0.3)
        from concurrent.futures import Future
        good = Future()
        mb._score_group([(r, d, MidResolveCancel()), (r, d, good)])
        assert good.result(0) == pytest.approx(0.3)
        assert mb.stats["errors"] == 0
        # same guard on the error path: a scorer failure plus a
        # mid-resolve cancel must not escape _score_group
        class Boom:
            def score_batch(self, refs, dists):
                raise RuntimeError("device fault")
        mb2 = MicroBatcher(Boom(), max_batch=4)
        bad = Future()
        mb2._score_group([(r, d, MidResolveCancel()), (r, d, bad)])
        with pytest.raises(RuntimeError):
            bad.result(0)


def _npz_body(**arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status, json.loads(resp.read())


class TestScoringServer:
    @pytest.fixture
    def server(self):
        srv = ScoringServer(FakeScorer(), port=0, max_batch=4,
                            max_wait_ms=2.0).start()
        yield srv
        srv.stop()

    def test_score_endpoint(self, server):
        host, port = server.address
        ref, dist = make_pair(None, 0.25)
        status, out = _post(f"http://{host}:{port}/score",
                            _npz_body(ref=ref, dist=dist))
        assert status == 200
        assert out["q"] == pytest.approx(0.25)

    def test_compare_endpoint(self, server):
        host, port = server.address
        ref, da = make_pair(None, 0.4)   # q_a = 0.4
        _, db = make_pair(None, 0.1)     # q_b = 0.1
        status, out = _post(f"http://{host}:{port}/compare",
                            _npz_body(ref=ref, dist_a=da, dist_b=db))
        assert status == 200
        assert out["q_a"] == pytest.approx(0.4)
        assert out["preference"] == pytest.approx(
            1.0 / (1.0 + np.exp(-(0.4 - 0.1))))

    def test_healthz(self, server):
        host, port = server.address
        with urllib.request.urlopen(
                f"http://{host}:{port}/healthz", timeout=10) as resp:
            out = json.loads(resp.read())
        assert out["ok"] is True

    def test_bad_body_is_400(self, server):
        host, port = server.address
        req = urllib.request.Request(f"http://{host}:{port}/score",
                                     data=b"not an npz", method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 400

    def test_missing_array_is_400(self, server):
        host, port = server.address
        ref, _ = make_pair(None, 0.1)
        req = urllib.request.Request(f"http://{host}:{port}/score",
                                     data=_npz_body(ref=ref), method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 400

    def test_concurrent_clients_batched(self, server):
        host, port = server.address
        results = {}

        def client(i):
            ref, dist = make_pair(None, i / 50.0)
            _, out = _post(f"http://{host}:{port}/score",
                           _npz_body(ref=ref, dist=dist))
            results[i] = out["q"]

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(6)]
        [t.start() for t in threads]
        for t in threads:
            t.join(60)
            assert not t.is_alive(), "client thread did not finish"
        for i in range(6):
            assert results[i] == pytest.approx(i / 50.0)


class TestEndToEndRealScorer:
    def test_real_tiny_scorer_through_server(self):
        """Full path with a REAL (tiny) VTAMIQ model on CPU."""
        from vtamiq_tpu.inference import VTAMIQScorer
        from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig

        cfg = VTAMIQConfig(vit=get_vit_config(
            num_keep_layers=1, num_extra_tokens=2, hidden_size=32,
            mlp_dim=64, num_heads=2), num_rgs=1, num_rcabs=1, ca_reduction=4)
        scorer = VTAMIQScorer(cfg=cfg, patch_count=16)
        srv = ScoringServer(scorer, port=0, max_batch=2,
                            max_wait_ms=2.0).start()
        try:
            host, port = srv.address
            rng = np.random.default_rng(0)
            ref = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
            dist = np.clip(ref + rng.normal(0, 0.2, ref.shape), 0, 1).astype(np.float32)
            status, out = _post(f"http://{host}:{port}/score",
                                _npz_body(ref=ref, dist=dist))
            assert status == 200
            assert np.isfinite(out["q"])

            # uint8 payloads are valid on every path: _load_npz passes them
            # through and the scorer treats uint8 as 0-255 image data (÷255
            # host-side without ingest_uint8). An already-quantized pair
            # must score identically through both content types.
            ref8 = np.round(ref * 255).astype(np.uint8)
            dist8 = np.round(dist * 255).astype(np.uint8)
            s1, out_f = _post(f"http://{host}:{port}/score",
                              _npz_body(ref=ref8.astype(np.float32) / 255.0,
                                        dist=dist8.astype(np.float32) / 255.0))
            s2, out_u = _post(f"http://{host}:{port}/score",
                              _npz_body(ref=ref8, dist=dist8))
            assert s1 == 200 and s2 == 200
            # same pipeline + same RNG stream position modulo batcher order:
            # scores differ only by the sampler key, so just require both
            # finite and the dtypes to not change the SCALE of the result
            assert np.isfinite(out_f["q"]) and np.isfinite(out_u["q"])
        finally:
            srv.stop()


class TestBucketedServing:
    """Variable-size traffic over canonical buckets (round-3): mixed shapes
    coalesce into shared padded device batches; restrict_to_warmed admits
    any shape a warmed bucket covers."""

    def _scorer(self, buckets):
        from vtamiq_tpu.inference import VTAMIQScorer
        from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig
        cfg = VTAMIQConfig(vit=get_vit_config(
            num_keep_layers=1, num_extra_tokens=2, hidden_size=32,
            mlp_dim=64, num_heads=2), num_rgs=1, num_rcabs=1, ca_reduction=4)
        return VTAMIQScorer(cfg=cfg, patch_count=16, size_buckets=buckets)

    def test_mixed_shapes_coalesce_into_bucket_batches(self):
        from vtamiq_tpu.data.buckets import compute_canonical_buckets
        shapes = [(48, 56), (56, 64), (64, 64), (80, 96), (96, 96), (96, 112)]
        buckets = compute_canonical_buckets(shapes, max_buckets=2)
        scorer = self._scorer(buckets)
        mb = MicroBatcher(scorer, max_batch=8, max_wait_ms=100.0).start()
        try:
            rng = np.random.default_rng(0)
            futs = []
            for h, w in shapes:
                ref = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
                dist = np.clip(ref + rng.normal(0, 0.1, ref.shape), 0, 1
                               ).astype(np.float32)
                futs.append(mb.submit(ref, dist))
            qs = [f.result(120) for f in futs]
            assert all(np.isfinite(q) for q in qs)
            # 6 shapes -> at most one device batch per bucket (2), and the
            # scorer compiled at most one pipeline per (bucket, ladder size)
            assert mb.stats["batches"] <= len(buckets)
            assert len(scorer._pipelines) <= len(buckets)
        finally:
            mb.stop()

    def test_warmed_bucket_admits_covered_novel_shapes(self):
        scorer = self._scorer([(64, 96)])
        mb = MicroBatcher(scorer, max_batch=2, max_wait_ms=1.0,
                          restrict_to_warmed=True).start()
        try:
            mb.warmup(64, 96, batch_sizes=[1])
            rng = np.random.default_rng(1)
            # novel TRUE shape, covered by the warmed bucket -> accepted
            ref = rng.uniform(0, 1, (50, 70, 3)).astype(np.float32)
            q = mb.score(ref, ref, timeout=120)
            assert np.isfinite(q)
            # uncovered shape -> fast 4xx-style rejection, no compile stall
            big = rng.uniform(0, 1, (128, 128, 3)).astype(np.float32)
            with pytest.raises(Exception):
                mb.submit(big, big)
        finally:
            mb.stop()


class TestStopLifecycle:
    def test_submit_after_stop_rejected(self):
        from vtamiq_tpu.serving import QueueFullError
        mb = MicroBatcher(FakeScorer(), max_batch=2).start()
        mb.stop()
        with pytest.raises(QueueFullError, match="stopped"):
            mb.submit(*make_pair(None, 0.1))

    def test_restart_after_clean_stop(self):
        mb = MicroBatcher(FakeScorer(), max_batch=2, max_wait_ms=1.0).start()
        mb.stop()
        mb.start()
        try:
            assert mb.score(*make_pair(None, 0.25), timeout=10) == \
                pytest.approx(0.25)
        finally:
            mb.stop()

    def test_stop_survives_racing_cancel(self):
        """A future whose set_exception raises InvalidStateError (caller
        cancel landing mid-drain) must not crash stop()."""
        from concurrent.futures import InvalidStateError

        class CancelMidDrain:
            done = staticmethod(lambda: False)

            def set_exception(self, *_):
                raise InvalidStateError("cancelled mid-drain")

        mb = MicroBatcher(FakeScorer(), max_batch=2)  # not started
        ref, dist = make_pair(None, 0.1)
        mb._queue.put_nowait((ref, dist, CancelMidDrain()))
        mb.stop()  # must not raise
