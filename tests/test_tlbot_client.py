"""TelegramClient HTTP layer against a local mock Bot API server."""

import asyncio

import numpy as np
import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp import web  # noqa: E402
from aiohttp.test_utils import TestServer  # noqa: E402

from artstyletransfer_tpu.frontends.tlbot import TelegramClient  # noqa: E402


class MockBotApi:
    """Implements just enough of api.telegram.org for the client."""

    def __init__(self):
        self.sent_messages = []
        self.sent_photos = []
        self.file_bytes = b"\xff\xd8fakejpegdata"
        app = web.Application()
        app.router.add_post("/bot{token}/sendMessage", self.send_message)
        app.router.add_post("/bot{token}/sendPhoto", self.send_photo)
        app.router.add_post("/bot{token}/getFile", self.get_file)
        app.router.add_post("/bot{token}/getUpdates", self.get_updates)
        app.router.add_get("/file/bot{token}/{path:.*}", self.download)
        self.app = app

    async def send_message(self, request):
        data = await request.json()
        self.sent_messages.append(data)
        return web.json_response({"ok": True, "result": {"message_id": 1}})

    async def send_photo(self, request):
        form = await request.post()
        photo = form["photo"]
        self.sent_photos.append({
            "chat_id": form["chat_id"],
            "caption": form["caption"],
            "bytes": photo.file.read(),
            "filename": photo.filename,
        })
        return web.json_response({"ok": True, "result": {"message_id": 2}})

    async def get_file(self, request):
        data = await request.json()
        return web.json_response(
            {"ok": True, "result": {"file_id": data["file_id"],
                                    "file_path": "photos/file_1.jpg"}})

    async def get_updates(self, request):
        return web.json_response(
            {"ok": True,
             "result": [{"update_id": 10,
                         "message": {"chat": {"id": 5}, "text": "/start"}}]})

    async def download(self, request):
        return web.Response(body=self.file_bytes)


def test_client_round_trips():
    api = MockBotApi()

    async def go():
        server = TestServer(api.app)
        await server.start_server()
        try:
            client = TelegramClient("TESTTOKEN")
            base = f"http://{server.host}:{server.port}"
            client._base = f"{base}/botTESTTOKEN"
            client._file_base = f"{base}/file/botTESTTOKEN"

            await client.send_message(5, "hello <b>there</b>")
            updates = await client.get_updates(None)
            data = await client.download_file("f123")
            await client.send_photo(5, b"\xff\xd8jpegbytes", "Progress: 20%",
                                    filename="image_20.jpg")
            await client.close()
            return updates, data
        finally:
            await server.close()

    updates, data = asyncio.run(go())
    assert api.sent_messages[0]["chat_id"] == 5
    assert api.sent_messages[0]["parse_mode"] == "HTML"
    assert updates[0]["update_id"] == 10
    assert data == api.file_bytes
    photo = api.sent_photos[0]
    assert photo["chat_id"] == "5"
    assert photo["caption"] == "Progress: 20%"
    assert photo["bytes"] == b"\xff\xd8jpegbytes"
    assert photo["filename"] == "image_20.jpg"


def test_client_raises_on_api_error():
    app = web.Application()

    async def fail(request):
        return web.json_response({"ok": False, "error_code": 401,
                                  "description": "Unauthorized"})

    app.router.add_post("/botBAD/sendMessage", fail)

    async def go():
        server = TestServer(app)
        await server.start_server()
        try:
            client = TelegramClient("BAD")
            client._base = f"http://{server.host}:{server.port}/botBAD"
            with pytest.raises(RuntimeError, match="sendMessage failed"):
                await client.send_message(1, "x")
            await client.close()
        finally:
            await server.close()

    asyncio.run(go())
