"""IO (checkpoint/animation/sampler JSON), LSH sampler, Simulation facade, CLI."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

import jax

from dieselfluid_tpu.config import FluidParams, SimConfig
from dieselfluid_tpu.io.animation import AnimationWriter, read_ply, write_ply
from dieselfluid_tpu.io.checkpoint import Checkpointer, load_checkpoint, save_checkpoint
from dieselfluid_tpu.io.sampler_json import SamplerJSON
from dieselfluid_tpu.models.particles import dam_break_state
from dieselfluid_tpu.models.sph import Simulation
from dieselfluid_tpu.neighbors import lsh


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        params = FluidParams.for_spacing(0.1)
        s = dam_break_state(6, params)
        cfg = SimConfig(n3=6)
        p = str(tmp_path / "ckpt")
        save_checkpoint(p, s, step=42, params=params, config=cfg)
        s2, step, p2, c2 = load_checkpoint(p)
        assert step == 42
        np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(s.pos))
        np.testing.assert_allclose(np.asarray(s2.vel), np.asarray(s.vel))
        assert p2.h == params.h and p2.d0 == params.d0
        assert c2.n3 == 6

    def test_overwrite(self, tmp_path):
        params = FluidParams.for_spacing(0.1)
        s = dam_break_state(4, params)
        p = str(tmp_path / "ckpt")
        save_checkpoint(p, s, step=1)
        save_checkpoint(p, s._replace(pos=s.pos + 1.0), step=2)
        s2, step, *_ = load_checkpoint(p)
        assert step == 2
        np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(s.pos) + 1.0)

    def test_rolling_manager(self, tmp_path):
        params = FluidParams.for_spacing(0.1)
        s = dam_break_state(4, params)
        ck = Checkpointer(str(tmp_path / "r"), keep=2, interval=10)
        for step in [10, 20, 30, 40]:
            assert ck.maybe_save(s, step)
        assert not ck.maybe_save(s, 41)
        assert ck._steps() == [30, 40]
        latest = ck.latest()
        assert latest[1] == 40


class TestAnimation:
    def test_ply_roundtrip(self, tmp_path):
        pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
        p = str(tmp_path / "f.ply")
        write_ply(p, pts)
        back = read_ply(p)
        np.testing.assert_allclose(back, pts)

    def test_npz_and_gif(self, tmp_path):
        w = AnimationWriter(str(tmp_path), "anim")
        for i in range(3):
            img = np.full((8, 8, 3), i / 3.0, np.float32)
            w.add_frame(np.zeros((10, 3)) + i, image=img)
        npz = w.write_npz({"note": "test"})
        data = np.load(npz)
        assert data["positions"].shape == (3, 10, 3)
        assert json.loads(str(data["metadata"]))["note"] == "test"
        vid = w.write_video(fmt="gif")
        assert vid.endswith(".gif") and os.path.exists(vid)


class TestSamplerJSON:
    def test_roundtrip(self, tmp_path):
        sj = SamplerJSON(name="curve", sampler_id=5,
                         domain=[380.0, 390.0], values=[0.1, 0.2])
        p = str(tmp_path / "s.json")
        sj.export_json(p)
        back = SamplerJSON.import_json(p)
        assert back.name == "curve" and back.sampler_id == 5
        assert back.values == [0.1, 0.2]

    def test_reads_reference_malformed_dialect(self, tmp_path):
        # The reference's data files omit the colon and brace-wrap arrays
        # (ref: data/CIEX.json) — the lenient reader must cope.
        p = str(tmp_path / "ref.json")
        with open(p, "w") as f:
            f.write('{\n "samplerMeta"{\n  "name":"CIE X",\n  "samplerID": 5\n },\n'
                    ' "samples_1D":{\n  "domain":{\n   360, 361, 362\n  },\n'
                    '  "values":{\n   0.1, 0.2, 0.3\n  }\n }\n}\n')
        back = SamplerJSON.import_json(p)
        assert back.name == "CIE X"
        assert back.domain == [360, 361, 362]
        assert back.values == [0.1, 0.2, 0.3]

    def test_reads_actual_reference_cie_file(self):
        ref = "/root/reference/data/CIEX.json"
        if not os.path.exists(ref):
            pytest.skip("reference data not mounted")
        back = SamplerJSON.import_json(ref)
        assert len(back.domain) == len(back.values) > 100
        assert back.sampler_id == 5


class TestLSH:
    def test_hash_range_and_determinism(self):
        spec = lsh.LSHSpec()
        key = jax.random.PRNGKey(0)
        vecs = lsh.hash_vectors(key, spec)
        pos = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (200, 3)), jnp.float32)
        h = lsh.lsh_hash(pos, vecs, spec.buckets)
        assert int(h.min()) >= 0 and int(h.max()) < spec.buckets
        h2 = lsh.lsh_hash(pos, vecs, spec.buckets)
        np.testing.assert_array_equal(np.asarray(h), np.asarray(h2))

    def test_samples_start_with_own_bucket(self):
        spec = lsh.LSHSpec(samples=50)
        key = jax.random.PRNGKey(1)
        vecs = lsh.hash_vectors(key, spec)
        pos = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (300, 3)), jnp.float32)
        nb = lsh.get_samples(pos, vecs, spec)
        h = np.asarray(lsh.lsh_hash(pos, vecs, spec.buckets))
        idx = np.asarray(nb.idx)
        # Each particle's first samples must come from buckets >= its own
        # (cyclic forward scan, ref: lsh.go GetSamples)
        first = h[idx[:, 0]]
        ok = (first >= h) | (first < h)  # trivially true; check membership:
        # own bucket-mates (if any) appear in the sample window
        for i in range(0, 300, 50):
            mates = np.where(h == h[i])[0]
            assert any(m in idx[i] for m in mates)

    def test_gpu_export_shapes(self):
        spec = lsh.LSHSpec()
        key = jax.random.PRNGKey(2)
        vecs = lsh.hash_vectors(key, spec)
        pos = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (510, 3)), jnp.float32)
        table = lsh.get_data_1d(pos, vecs, spec)
        assert table.shape == (spec.buckets * spec.bucket_size(510),)
        flat = lsh.get_vectors(vecs)
        assert flat.shape == (spec.hash_bits * 3,)


class TestSimulationFacade:
    def test_create_and_step(self):
        sim = Simulation.create(SimConfig(n3=6, solver="wcsph", neighbors="cellgrid"))
        assert sim.n() == 216
        d = sim.step(3)
        assert sim.step_count == 3
        assert np.isfinite(float(d.max_vel))

    def test_rollout(self):
        sim = Simulation.create(SimConfig(n3=6, solver="pcisph", neighbors="bruteforce"))
        traj, vmax = sim.rollout(5)
        assert traj.shape == (5, 216, 3)
        assert sim.step_count == 5

    def test_cache_incr_schedule(self):
        sim = Simulation.create(SimConfig(n3=4))
        lives = [sim.cache_incr() for _ in range(4)]
        assert lives[0] == pytest.approx(0.8 ** 2)
        assert lives[-1] == pytest.approx(0.8)  # reset after decay below 0.1

    def test_set_viscosity_rebinds(self):
        sim = Simulation.create(SimConfig(n3=4))
        sim.set_viscosity(0.2)
        assert sim.viscosity() == 0.2
        sim.step()


class TestCLI:
    def test_cli_runs(self, tmp_path):
        from dieselfluid_tpu.app.cli import main

        rc = main(["--n3", "5", "--steps", "5", "--out", str(tmp_path),
                   "--solver", "wcsph"])
        assert rc == 0
        assert os.path.exists(tmp_path / "wcsph_5.npz")


class TestNativeFramepack:
    def test_ply_sequence_native_or_fallback(self, tmp_path):
        import numpy as np
        from dieselfluid_tpu.io import native
        from dieselfluid_tpu.io.animation import read_ply

        traj = np.random.default_rng(3).normal(size=(4, 100, 3)).astype(np.float32)
        n = native.write_ply_sequence(str(tmp_path), "seq", traj)
        assert n == 4
        back = read_ply(str(tmp_path / "seq_00002.ply"))
        np.testing.assert_array_equal(back, traj[2])

    def test_dfc_roundtrip(self, tmp_path):
        import numpy as np
        from dieselfluid_tpu.io import native

        traj = np.random.default_rng(4).normal(size=(3, 50, 3)).astype(np.float32)
        p = str(tmp_path / "t.dfc")
        native.write_dfc(p, traj)
        back = native.read_dfc(p)
        np.testing.assert_array_equal(back, traj)

    def test_animation_writer_dfc(self, tmp_path):
        import numpy as np
        from dieselfluid_tpu.io.animation import AnimationWriter
        from dieselfluid_tpu.io import native

        w = AnimationWriter(str(tmp_path), "a")
        for i in range(3):
            w.add_frame(np.full((10, 3), float(i), np.float32))
        p = w.write_dfc()
        back = native.read_dfc(p)
        assert back.shape == (3, 10, 3)
        np.testing.assert_allclose(back[2], 2.0)


class TestStreamWriter:
    """Async native frame streaming (native/framepack.cpp stream API)."""

    def test_dfc_stream_roundtrip(self, tmp_path):
        from dieselfluid_tpu.io.native import StreamWriter, read_dfc

        n = 100
        frames = [np.random.RandomState(i).rand(n, 3).astype(np.float32)
                  for i in range(7)]
        w = StreamWriter(str(tmp_path), "traj", n, mode="dfc", max_queue=2)
        for f in frames:
            w.append(f)
        assert w.close() == 7
        back = read_dfc(str(tmp_path / "traj.dfc"))
        assert back.shape == (7, n, 3)
        np.testing.assert_array_equal(back, np.stack(frames))

    def test_ply_stream_counts_files(self, tmp_path):
        import os

        from dieselfluid_tpu.io.native import StreamWriter

        n = 64
        w = StreamWriter(str(tmp_path), "pts", n, mode="ply")
        for i in range(4):
            w.append(np.full((n, 3), float(i), np.float32))
        assert w.close() == 4
        plys = [f for f in os.listdir(tmp_path) if f.endswith(".ply")]
        assert len(plys) == 4


class TestServeRange:
    """HTTP Range support in app/serve.py — what viewer.html?live= relies
    on to tail a growing .dfc (round-3 verdict, next-step #9)."""

    @pytest.fixture()
    def server(self, tmp_path):
        import struct
        import threading
        import functools
        import http.server

        from dieselfluid_tpu.app.serve import RangeRequestHandler, install_viewer

        n = 10
        dfc = tmp_path / "live.dfc"
        dfc.write_bytes(b"DFC1" + struct.pack("<qq", 1, n)
                        + np.arange(2 * n * 3, dtype="<f4").tobytes())
        install_viewer(str(tmp_path))
        handler = functools.partial(RangeRequestHandler,
                                    directory=str(tmp_path))
        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield srv, dfc, n
        srv.shutdown()

    def test_range_requests_and_growth(self, server):
        import struct
        import urllib.request

        srv, dfc, n = server
        port = srv.server_address[1]
        url = f"http://127.0.0.1:{port}/live.dfc"

        def fetch(lo, hi):
            req = urllib.request.Request(url,
                                         headers={"Range": f"bytes={lo}-{hi}"})
            with urllib.request.urlopen(req) as r:
                assert r.status == 206
                assert r.headers["Content-Range"].startswith(f"bytes {lo}-")
                return r.read()

        hdr = fetch(0, 19)
        assert hdr[:4] == b"DFC1"
        assert struct.unpack("<q", hdr[12:20])[0] == n
        frame0 = fetch(20, 20 + n * 12 - 1)
        np.testing.assert_array_equal(
            np.frombuffer(frame0, "<f4"), np.arange(n * 3, dtype="<f4"))

        # The file grows (a streaming sim appends); the tail range returns
        # exactly the new frame's bytes.
        with open(dfc, "ab") as f:
            f.write(np.full(n * 3, 7.0, dtype="<f4").tobytes())
        tail = fetch(20 + 2 * n * 12, 20 + 3 * n * 12 - 1)
        np.testing.assert_array_equal(np.frombuffer(tail, "<f4"),
                                      np.full(n * 3, 7.0, "<f4"))

        # Unsatisfiable range -> 416; plain GET still 200.
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as e:
            fetch(10 ** 9, 10 ** 9 + 1)
        assert e.value.code == 416
        with urllib.request.urlopen(url) as r:
            assert r.status == 200


class TestControlChannel:
    """GUI->sim control: POST /control -> control.json -> CLI polling
    (the reference's declared-but-unwired RPC registry, dslapp/app.go)."""

    def test_post_control_and_poll(self, tmp_path):
        import functools
        import http.server
        import threading
        import urllib.request

        from dieselfluid_tpu.app.cli import _poll_control
        from dieselfluid_tpu.app.serve import RangeRequestHandler

        handler = functools.partial(RangeRequestHandler,
                                    directory=str(tmp_path))
        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        port = srv.server_address[1]
        ctl_file = str(tmp_path / "control.json")

        def post(body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/control", data=body,
                headers={"Content-Type": "application/json"}, method="POST")
            return urllib.request.urlopen(req).status

        cache = {}
        # no file yet -> run
        assert _poll_control(ctl_file, cache) == "run"
        assert post(b'{"quit": true}') == 200
        assert json.load(open(ctl_file)) == {"quit": True}
        assert _poll_control(ctl_file, cache) == "quit"
        # pause then resume from another thread; poll blocks until resumed
        assert post(b'{"paused": true}') == 200
        t = threading.Timer(0.5, lambda: post(b'{"paused": false}'))
        t.start()
        assert _poll_control(ctl_file, {}) == "run"
        t.join()
        # malformed body rejected
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as e:
            post(b'[1, 2]')
        assert e.value.code == 400
        srv.shutdown()
