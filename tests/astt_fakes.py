"""Shared aiohttp-free test fakes.

Kept outside test_frontends so tests that do not need aiohttp are not
gated on its availability (the bot is transport-agnostic —
frontends/tlbot.py defers its aiohttp imports into the real
TelegramClient), and so the demo-image scaffolding has ONE copy instead
of three.
"""

import asyncio

import numpy as np

from artstyletransfer_tpu.utils.image import encode_jpeg


async def fake_engine(pair, *args, **kwargs):
    for i in range(2):
        await asyncio.sleep(0)
        pct = (i + 1) * 50.0
        yield pct, np.full((8, 8, 3), 0.5, np.float32)


class FakeTelegramClient:
    def __init__(self):
        self.messages = []   # (chat_id, text)
        self.photos = []     # (chat_id, caption)
        self.files = {}      # file_id -> bytes

    async def send_message(self, chat_id, text):
        self.messages.append((chat_id, text))

    async def send_photo(self, chat_id, jpeg_bytes, caption, filename=None):
        assert jpeg_bytes[:2] == b"\xff\xd8"
        self.photos.append((chat_id, caption))

    async def download_file(self, file_id):
        return self.files[file_id]


def _photo_message(chat_id, file_id, group_id=None):
    msg = {"chat": {"id": chat_id},
           "photo": [{"file_id": f"{file_id}-small"},
                     {"file_id": file_id}]}
    if group_id:
        msg["media_group_id"] = group_id
    return msg


def _jpeg_bytes():
    return encode_jpeg(np.random.default_rng(1).random((8, 8, 3))
                       .astype(np.float32))


def _write_demo_images(tmp_path):
    import cv2

    for sub in ("content-images", "style-images"):
        (tmp_path / sub).mkdir(parents=True, exist_ok=True)
    img = (np.random.default_rng(0).random((16, 16, 3)) * 255).astype("uint8")
    cv2.imwrite(str(tmp_path / "content-images" / "c.jpg"), img)
    cv2.imwrite(str(tmp_path / "style-images" / "s.jpg"), img)
