#!/usr/bin/env python
"""Generate the committed demo images (assets/img) deterministically.

The reference ships 8 photos for its semantic-search example
(reference: assets/img, examples/search.rs:26-58). This repo has no
photo corpus to commit, so the demo corpus is synthetic but visually
distinct scenes — enough for examples/search.py to rank meaningfully."""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw

OUT = Path(__file__).resolve().parents[1] / "assets" / "img"
SIZE = 256


def save(name: str, img: Image.Image) -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    img.save(OUT / name, quality=88)
    print(f"wrote {OUT / name}")


def sky_gradient(top, bottom):
    img = Image.new("RGB", (SIZE, SIZE))
    px = img.load()
    for y in range(SIZE):
        t = y / (SIZE - 1)
        px_row = tuple(int(a + (b - a) * t) for a, b in zip(top, bottom))
        for x in range(SIZE):
            px[x, y] = px_row
    return img


def ocean_waves():
    img = sky_gradient((120, 180, 230), (10, 60, 120))
    d = ImageDraw.Draw(img)
    for row in range(8):
        y0 = 120 + row * 16
        pts = [(x, y0 + int(6 * math.sin(x / 14 + row)))
               for x in range(0, SIZE, 4)]
        d.line(pts, fill=(235, 245, 255), width=2)
    return img


def forest():
    img = sky_gradient((200, 225, 245), (90, 140, 90))
    d = ImageDraw.Draw(img)
    rng = np.random.default_rng(1)
    for i in range(28):
        x = int(rng.integers(8, SIZE - 8))
        h = int(rng.integers(50, 110))
        y = int(rng.integers(100, SIZE - 10))
        d.polygon([(x - 14, y), (x + 14, y), (x, y - h)],
                  fill=(20 + int(rng.integers(0, 40)),
                        90 + int(rng.integers(0, 60)), 30))
        d.rectangle([x - 3, y, x + 3, y + 8], fill=(90, 60, 30))
    return img


def city_night():
    img = sky_gradient((10, 10, 40), (30, 30, 60))
    d = ImageDraw.Draw(img)
    rng = np.random.default_rng(2)
    x = 4
    while x < SIZE - 20:
        w = int(rng.integers(18, 40))
        h = int(rng.integers(60, 170))
        d.rectangle([x, SIZE - h, x + w, SIZE], fill=(25, 25, 35))
        for wy in range(SIZE - h + 6, SIZE - 6, 12):
            for wx in range(x + 4, x + w - 4, 8):
                if rng.random() < 0.55:
                    d.rectangle([wx, wy, wx + 3, wy + 5],
                                fill=(250, 220, 120))
        x += w + int(rng.integers(2, 10))
    return img


def red_balloon():
    img = sky_gradient((160, 210, 250), (220, 235, 250))
    d = ImageDraw.Draw(img)
    d.ellipse([95, 50, 165, 135], fill=(210, 30, 40))
    d.line([(130, 135), (126, 210)], fill=(80, 80, 80), width=2)
    return img


def starry_night():
    img = sky_gradient((2, 2, 18), (8, 8, 35))
    d = ImageDraw.Draw(img)
    rng = np.random.default_rng(3)
    for _ in range(140):
        x, y = int(rng.integers(0, SIZE)), int(rng.integers(0, SIZE))
        r = int(rng.integers(1, 3))
        d.ellipse([x, y, x + r, y + r], fill=(255, 255, 230))
    d.ellipse([180, 30, 225, 75], fill=(240, 240, 210))
    return img


def desert_dunes():
    img = sky_gradient((250, 210, 150), (240, 180, 90))
    d = ImageDraw.Draw(img)
    for row in range(4):
        y0 = 120 + row * 35
        pts = [(x, y0 + int(14 * math.sin(x / 40 + row * 2)))
               for x in range(0, SIZE, 4)] + [(SIZE, SIZE), (0, SIZE)]
        shade = 200 - row * 18
        d.polygon(pts, fill=(shade, int(shade * 0.72), int(shade * 0.38)))
    return img


def main() -> None:
    save("ocean_waves.jpg", ocean_waves())
    save("forest.jpg", forest())
    save("city_night.jpg", city_night())
    save("red_balloon.jpg", red_balloon())
    save("starry_night.jpg", starry_night())
    save("desert_dunes.jpg", desert_dunes())


if __name__ == "__main__":
    main()
