import numpy as np
import pytest

from mpreid_tpu.native import native_available, re_ranking_native
from mpreid_tpu.ops.reranking_numpy import re_ranking_numpy

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable"
)


def clustered(seed=3, n_ids=8, nq=24, ng=56, dim=16):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_ids, dim) * 3
    qf = np.stack([centers[i % n_ids] + rng.randn(dim) * 0.5 for i in range(nq)])
    gf = np.stack([centers[i % n_ids] + rng.randn(dim) * 0.5 for i in range(ng)])
    return qf.astype(np.float32), gf.astype(np.float32)


@pytest.mark.parametrize("k1,k2", [(10, 4), (6, 1), (20, 6)])
def test_native_matches_numpy_oracle(k1, k2):
    qf, gf = clustered()
    ref = re_ranking_numpy(qf, gf, k1=k1, k2=k2, lambda_value=0.3)
    got = re_ranking_native(qf, gf, k1=k1, k2=k2, lambda_value=0.3)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_native_clamps_small_gallery():
    qf, gf = clustered(nq=4, ng=5)
    out = re_ranking_native(qf, gf, k1=50, k2=15)
    assert out.shape == (4, 5) and np.isfinite(out).all()


# ---------------------------------------------------------------------------
# native batch image loader (imageio.cpp)
# ---------------------------------------------------------------------------


class TestNativeImageIO:
    @pytest.fixture(autouse=True)
    def _skip_without_lib(self):
        from mpreid_tpu.native import native_imageio_available

        if not native_imageio_available():
            pytest.skip("native imageio unavailable (toolchain/libs/self-check)")

    def _fixture_images(self, tmp_path, sizes, fmt="jpeg"):
        from PIL import Image

        rng = np.random.RandomState(7)
        paths = []
        for i, (h, w) in enumerate(sizes):
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            p = tmp_path / f"img_{i}.{ 'jpg' if fmt == 'jpeg' else 'png' }"
            Image.fromarray(img).save(str(p))
            paths.append(str(p))
        return paths

    @pytest.mark.parametrize("fmt", ["jpeg", "png"])
    def test_batch_decode_matches_pil_exactly(self, tmp_path, fmt):
        from PIL import Image

        from mpreid_tpu.native import decode_resize_batch_native

        sizes = [(70, 33), (128, 64), (45, 90), (256, 128), (32, 16)]
        paths = self._fixture_images(tmp_path, sizes, fmt)
        batch, status = decode_resize_batch_native(paths, (64, 32))
        assert (status == 0).all()
        for i, p in enumerate(paths):
            pil = np.asarray(
                Image.open(p).convert("RGB").resize((32, 64), Image.BICUBIC),
                np.uint8,
            )
            np.testing.assert_array_equal(batch[i], pil)

    @pytest.mark.parametrize("out_hw", [(256, 128), (13, 7), (70, 33)])
    def test_resize_matches_pil_up_and_down(self, out_hw):
        """PIL-exact fixed-point bicubic incl. the antialiased downscale."""
        from PIL import Image

        from mpreid_tpu.native import resize_rgb8_native

        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (70, 33, 3), dtype=np.uint8)
        got = resize_rgb8_native(img, *out_hw)
        exp = np.asarray(
            Image.fromarray(img).resize((out_hw[1], out_hw[0]), Image.BICUBIC),
            np.uint8,
        )
        np.testing.assert_array_equal(got, exp)

    def test_failures_reported_not_fatal(self, tmp_path):
        from mpreid_tpu.native import decode_resize_batch_native

        good = self._fixture_images(tmp_path, [(40, 20)])[0]
        bad = str(tmp_path / "missing.jpg")
        garbage = tmp_path / "garbage.jpg"
        garbage.write_bytes(b"not an image at all")
        batch, status = decode_resize_batch_native(
            [good, bad, str(garbage)], (32, 16)
        )
        assert status[0] == 0 and status[1] != 0 and status[2] != 0
        assert (batch[1] == 0).all() and (batch[2] == 0).all()

    def test_batcher_native_equals_pil_path(self, tmp_path):
        """ImageBatcher with native decode yields byte-identical batches."""
        from mpreid_tpu.data.loader import ImageBatcher

        paths = self._fixture_images(
            tmp_path, [(60, 30), (80, 40), (64, 32), (50, 25), (32, 16)]
        )
        records = [(p, i, 0, 0) for i, p in enumerate(paths)]
        nat = ImageBatcher(records, (48, 24), batch_size=2, native=True)
        pil = ImageBatcher(records, (48, 24), batch_size=2, native=False)
        for bn, bp in zip(nat.iter_sequential(), pil.iter_sequential()):
            np.testing.assert_array_equal(bn["images"], bp["images"])
            np.testing.assert_array_equal(bn["pids"], bp["pids"])

    def test_16bit_grayscale_png_falls_back_to_pil(self, tmp_path):
        """PIL opens 16-bit grayscale as mode 'I' and convert('RGB') clamps
        at 255 — different pixels than a high-byte strip. The native decoder
        must REFUSE these files (status != 0) so the batcher's per-image PIL
        fallback keeps byte-parity."""
        from PIL import Image

        from mpreid_tpu.data.loader import ImageBatcher
        from mpreid_tpu.native import decode_resize_batch_native

        arr = (np.linspace(0, 40000, 48 * 24).reshape(48, 24)).astype(np.int32)
        p = tmp_path / "gray16.png"
        Image.fromarray(arr, mode="I").save(str(p))

        _, status = decode_resize_batch_native([str(p)], (32, 16))
        assert status[0] != 0

        records = [(str(p), 0, 0, 0)]
        nat = ImageBatcher(records, (32, 16), batch_size=1, native=True)
        pil = ImageBatcher(records, (32, 16), batch_size=1, native=False)
        bn = next(iter(nat.iter_sequential()))
        bp = next(iter(pil.iter_sequential()))
        np.testing.assert_array_equal(bn["images"], bp["images"])
