"""Golden-output regression test.

The reference's analogue is its bundled corpora + README golden figures
(SURVEY §4). Here a full 2-level Adam transfer with seeded weights/noise is
pinned against a committed golden: any numerics change in the VGG stack,
resize, losses, noise init, or optimizer shows up as a PSNR drop.
"""

import os

import numpy as np

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine.transfer import TransferJob
from artstyletransfer_tpu.models.weights import init_vgg19_params

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "transfer_2lvl_adam.npz")


def psnr(a, b):
    mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def test_golden_transfer_reproduces():
    data = np.load(GOLDEN)
    cfg = Config(levels_num=2, iters_num=10, base_diameter=16,
                 optimizer="adam", stream_every=10, seed=7)
    job = TransferJob(np.asarray(data["content"]), np.asarray(data["style"]),
                      cfg, params=init_vgg19_params(seed=0))
    done, img, loss = list(job.run())[-1]
    assert done == 10
    # the golden was generated under this exact test environment; Adam at
    # lr=10 is chaotic, so the bound is generous but a real numerics change
    # (resize kernel, tap order, loss formula) still lands far below it
    assert psnr(img, data["image"]) > 35.0, psnr(img, data["image"])
    np.testing.assert_allclose(loss, float(data["loss"]), rtol=5e-2)


GOLDEN_1STEP = os.path.join(os.path.dirname(__file__), "goldens",
                            "transfer_2lvl_adam_1step.npz")


def test_golden_one_step_bitlevel():
    """One optimization step against a bit-level golden: strictly stronger
    than the 10-step PSNR gate above (a single step has no chaotic
    amplification, so even subtle numerics drift in the VGG stack, resize,
    losses, or Adam shows up directly)."""
    data = np.load(GOLDEN_1STEP)
    cfg = Config(levels_num=2, iters_num=1, base_diameter=16,
                 optimizer="adam", stream_every=1, seed=7)
    job = TransferJob(np.asarray(data["content"]), np.asarray(data["style"]),
                      cfg, params=init_vgg19_params(seed=0))
    done, img, loss = list(job.run())[-1]
    assert done == 1
    np.testing.assert_allclose(loss, float(data["loss"]), rtol=1e-6)
    np.testing.assert_allclose(img, data["image"], rtol=1e-6, atol=1e-7)
