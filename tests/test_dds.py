"""DXT1/3/5 decode + DDS container ingestion (reference LoadTexture's
compressed path, CKDX9RasterizerContext.cpp:1836-2060). Expected texel
values are hand-computed from the BC format spec."""

import struct

import numpy as np

from ckrenderengine_tpu.io.dds import decode_dxt, load_dds
from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh, CKTexture,
)


def _c565(r, g, b):
    return ((r >> 3) << 11) | ((g >> 2) << 5) | (b >> 3)


def _expand565(c):
    r = (c >> 11) & 31
    g = (c >> 5) & 63
    b = c & 31
    return np.array([(r << 3) | (r >> 2), (g << 2) | (g >> 4),
                     (b << 3) | (b >> 2)]) / 255.0


class TestDXTDecode:
    def test_dxt1_four_color_mode(self):
        c0 = _c565(255, 0, 0)          # red (c0 > c1 -> 4-color)
        c1 = _c565(0, 0, 255)          # blue
        assert c0 > c1
        # indices: texel 0 -> 0 (c0), texel 1 -> 1 (c1), texel 2 -> 2, rest 3
        bits = 0 | (1 << 2) | (2 << 4)
        for k in range(3, 16):
            bits |= 3 << (2 * k)
        data = struct.pack("<HHI", c0, c1, bits)
        img = decode_dxt(data, 4, 4, "DXT1")
        e0, e1 = _expand565(c0), _expand565(c1)
        np.testing.assert_allclose(img[0, 0, :3], e0, atol=1e-6)
        np.testing.assert_allclose(img[0, 1, :3], e1, atol=1e-6)
        np.testing.assert_allclose(img[0, 2, :3], (2 * e0 + e1) / 3, atol=1e-6)
        np.testing.assert_allclose(img[0, 3, :3], (e0 + 2 * e1) / 3, atol=1e-6)
        assert np.all(img[..., 3] == 1.0)

    def test_dxt1_three_color_punch_through(self):
        c0 = _c565(0, 255, 0)
        c1 = _c565(255, 0, 0)
        if c0 > c1:
            c0, c1 = c1, c0            # force c0 <= c1 -> 3-color mode
        bits = 0
        for k in range(16):
            bits |= (3 if k % 2 else 2) << (2 * k)
        data = struct.pack("<HHI", c0, c1, bits)
        img = decode_dxt(data, 4, 4, "DXT1")
        e0, e1 = _expand565(c0), _expand565(c1)
        np.testing.assert_allclose(img[0, 0, :3], (e0 + e1) / 2, atol=1e-6)
        assert img[0, 0, 3] == 1.0
        assert img[0, 1, 3] == 0.0     # punch-through transparent
        np.testing.assert_allclose(img[0, 1, :3], 0.0, atol=1e-6)

    def test_dxt3_explicit_alpha(self):
        c0 = _c565(255, 255, 255)
        c1 = _c565(0, 0, 0)
        bits = 0                        # all texels -> c0 (white)
        alpha_nibbles = 0
        for k in range(16):
            alpha_nibbles |= (k & 0xF) << (4 * k)   # texel k alpha = k*17
        data = struct.pack("<QHHI", alpha_nibbles, c0, c1, bits)
        img = decode_dxt(data, 4, 4, "DXT3")
        for k in range(16):
            y, x = divmod(k, 4)
            np.testing.assert_allclose(img[y, x, 3], (k * 17) / 255.0,
                                       atol=1e-6)
        np.testing.assert_allclose(img[..., :3], 1.0, atol=1e-6)

    def test_dxt5_interpolated_alpha(self):
        a0, a1 = 255, 55                # a0 > a1 -> 8-value interpolation
        aidx = 0
        for k, v in enumerate([0, 1, 2, 7] * 4):
            aidx |= v << (3 * k)
        abytes = aidx.to_bytes(6, "little")
        c0 = _c565(255, 0, 0)
        c1 = _c565(0, 0, 0)
        data = struct.pack("<BB", a0, a1) + abytes + struct.pack(
            "<HHI", c0, c1, 0)
        img = decode_dxt(data, 4, 4, "DXT5")
        np.testing.assert_allclose(img[0, 0, 3], 1.0, atol=1e-6)
        np.testing.assert_allclose(img[0, 1, 3], 55 / 255.0, atol=1e-6)
        np.testing.assert_allclose(img[0, 2, 3], (6 * 255 + 55) / 7 / 255.0,
                                   atol=1e-3)
        np.testing.assert_allclose(img[0, 3, 3], (255 + 6 * 55) / 7 / 255.0,
                                   atol=1e-3)

    def test_dxt5_five_value_mode(self):
        a0, a1 = 10, 200                # a0 <= a1 -> 6-value + 0/255
        aidx = 0
        vals = [0, 1, 6, 7] * 4
        for k, v in enumerate(vals):
            aidx |= v << (3 * k)
        data = struct.pack("<BB", a0, a1) + aidx.to_bytes(6, "little") + \
            struct.pack("<HHI", _c565(0, 0, 0), _c565(255, 255, 255), 0)
        img = decode_dxt(data, 4, 4, "DXT5")
        np.testing.assert_allclose(img[0, 0, 3], 10 / 255.0, atol=1e-6)
        np.testing.assert_allclose(img[0, 1, 3], 200 / 255.0, atol=1e-6)
        np.testing.assert_allclose(img[0, 2, 3], 0.0, atol=1e-6)
        np.testing.assert_allclose(img[0, 3, 3], 1.0, atol=1e-6)

    def test_non_multiple_of_four_crops(self):
        c0 = _c565(255, 0, 0)
        c1 = _c565(0, 0, 0)
        n_blocks = 2 * 2                # 6x6 -> 2x2 blocks
        data = struct.pack("<HHI", c0, c1, 0) * n_blocks
        img = decode_dxt(data, 6, 6, "DXT1")
        assert img.shape == (6, 6, 4)


def _make_dds_dxt1(w, h, mips, color=(255, 0, 0)):
    """Synthesize a DDS file: solid-color DXT1 surfaces for each mip."""
    surfaces = b""
    cw, ch = w, h
    c0 = _c565(*color)
    c1 = 0
    for _ in range(mips):
        nb = ((cw + 3) // 4) * ((ch + 3) // 4)
        surfaces += struct.pack("<HHI", max(c0, c1 + 1), c1, 0) * nb
        cw, ch = max(cw // 2, 1), max(ch // 2, 1)
    flags = 0x1 | 0x2 | 0x4 | 0x1000 | (0x20000 if mips > 1 else 0)
    pf = struct.pack("<II4sIIIII", 32, 0x4, b"DXT1", 0, 0, 0, 0, 0)
    header = (b"DDS " + struct.pack("<7I", 124, flags, h, w, 0, 0, mips)
              + b"\0" * 44 + pf + struct.pack("<5I", 0x1000, 0, 0, 0, 0))
    assert len(header) == 128
    return header + surfaces


class TestDDSContainer:
    def test_load_dds_with_mips(self, tmp_path):
        p = tmp_path / "fixture.dds"
        p.write_bytes(_make_dds_dxt1(16, 16, 3))
        levels = load_dds(str(p))
        assert len(levels) == 3
        assert levels[0].shape == (16, 16, 4)
        assert levels[1].shape == (8, 8, 4)
        assert levels[2].shape == (4, 4, 4)
        assert levels[0][0, 0, 0] > 0.9        # red

    def test_texture_loads_and_renders_dds(self, tmp_path):
        """The done-criterion: a DXT fixture loads and renders."""
        p = tmp_path / "crate.dds"
        p.write_bytes(_make_dds_dxt1(16, 16, 2, color=(0, 255, 0)))
        ctx = CKContext()
        rc = ctx.GetRenderManager().CreateRenderContext(64, 64)
        cam = CKCamera(ctx, "cam")
        cam.SetPosition((0.0, 0.0, -3.0))
        rc.AttachViewpointToCamera(cam)
        tex = CKTexture(ctx, "dxt")
        assert tex.LoadImage(str(p))
        assert tex.GetWidth() == 16
        assert len(tex.user_mip_levels) == 1   # shipped mip chain ingested
        mesh = CKMesh(ctx, "quad")
        s = 1.5
        mesh.SetPositions(np.array(
            [[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]], np.float32))
        mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
        mesh.SetUVs(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
        mesh.BuildNormals()
        mat = CKMaterial(ctx, "m")
        mat.SetTexture(tex)
        mat.SetEmissive((1, 1, 1, 1))
        mesh.ApplyGlobalMaterial(mat)
        obj = CK3dObject(ctx, "q")
        obj.SetCurrentMesh(mesh)
        rc.SetBackgroundColor((0, 0, 0, 1))
        rc.Render()
        fb = rc.framebuffer()
        center = fb[32, 32]
        assert center[1] > 0.9 and center[0] < 0.1   # green texel rendered

    def test_uncompressed_masked_rgba(self, tmp_path):
        # 2x2 A8R8G8B8 (BGRA byte order little-endian)
        pixels = struct.pack("<4I",
                             0xFFFF0000,   # opaque red
                             0xFF00FF00,   # opaque green
                             0xFF0000FF,   # opaque blue
                             0x80FFFFFF)   # half-alpha white
        pf = struct.pack("<II4sIIIII", 32, 0x40 | 0x1, b"\0\0\0\0", 32,
                         0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000)
        header = (b"DDS " + struct.pack("<7I", 124, 0x1 | 0x2 | 0x4 | 0x1000,
                                        2, 2, 0, 0, 1)
                  + b"\0" * 44 + pf + struct.pack("<5I", 0x1000, 0, 0, 0, 0))
        p = tmp_path / "raw.dds"
        p.write_bytes(header + pixels)
        (lv,) = load_dds(str(p))
        np.testing.assert_allclose(lv[0, 0], [1, 0, 0, 1], atol=1e-2)
        np.testing.assert_allclose(lv[0, 1], [0, 1, 0, 1], atol=1e-2)
        np.testing.assert_allclose(lv[1, 0], [0, 0, 1, 1], atol=1e-2)
        np.testing.assert_allclose(lv[1, 1], [1, 1, 1, 0x80 / 255], atol=1e-2)
