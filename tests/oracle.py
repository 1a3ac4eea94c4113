"""Scalar NumPy oracle implementing the reference semantics literally.

Used only by tests on tiny images: the device kernels must agree with these
straightforward per-pixel loops (which mirror /root/reference/src behavior
exactly, float32 throughout).
"""

import numpy as np

f32 = np.float32


def transform_buffer(src, width, height, topleft, topright, bottomleft,
                     nwidth, nheight, components, cfa=None):
    """Scalar port of scaling.rs:51-130. src flat [h*w*components] or cfa
    single-plane [h*w]; returns flat f32 array."""
    out = np.zeros(nwidth * nheight * components, dtype=f32)
    with np.errstate(divide="ignore", invalid="ignore"):
        skip_x_x = f32(f32(topright[0] - topleft[0]) / f32(nwidth - 1))
        skip_x_y = f32(f32(topright[1] - topleft[1]) / f32(nwidth - 1))
        skip_y_x = f32(f32(bottomleft[0] - topleft[0]) / f32(nheight - 1))
        skip_y_y = f32(f32(bottomleft[1] - topleft[1]) / f32(nheight - 1))

    err = np.errstate(divide="ignore", invalid="ignore")
    err.__enter__()
    for row in range(nheight):
        row_f = f32(row)
        from_x0 = f32(f32(topleft[0]) + skip_y_x * row_f)
        to_x0 = f32(f32(topleft[0]) + skip_y_x * f32(row + 1))
        from_y0 = f32(f32(topleft[1]) + skip_y_y * row_f)
        to_y0 = f32(f32(topleft[1]) + skip_y_y * f32(row + 1))
        center_x0 = f32(f32(topleft[0]) + skip_y_x * row_f + skip_y_x / f32(2.0) - f32(0.5))
        center_y0 = f32(f32(topleft[1]) + skip_y_y * row_f + skip_y_y / f32(2.0) - f32(0.5))
        for col in range(nwidth):
            def sat(v, maxv):
                v = np.floor(v)
                if np.isnan(v) or v < 0:
                    v = 0.0
                return min(maxv, int(v))
            from_x = sat(f32(from_x0 + skip_x_x * f32(col)), width - 1)
            to_x = sat(f32(to_x0 + skip_x_x * f32(col + 1)), width - 1)
            from_y = sat(f32(from_y0 + skip_x_y * f32(col)), height - 1)
            to_y = sat(f32(to_y0 + skip_x_y * f32(col + 1)), height - 1)
            center_x = f32(center_x0 + skip_x_x * f32(col) + skip_x_x / f32(2.0))
            center_y = f32(center_y0 + skip_x_y * f32(col) + skip_x_y / f32(2.0))

            sums = np.zeros(4, dtype=f32)
            counts = np.zeros(4, dtype=f32)
            for y in range(from_y, to_y + 1):
                for x in range(from_x, to_x + 1):
                    delta_x = f32(f32(f32(x) - center_x) / skip_x_x)
                    delta_y = f32(f32(f32(y) - center_y) / skip_y_y)
                    factor = f32(f32(1.0) - delta_x * delta_x - delta_y * delta_y)
                    if factor < 0.0:
                        factor = f32(0.0)
                    if cfa is not None:
                        c = cfa.color_at(y, x)
                        sums[c] += f32(src[y * width + x]) * factor
                        counts[c] += factor
                    else:
                        for c in range(components):
                            sums[c] += f32(src[(y * width + x) * components + c]) * factor
                            counts[c] += factor
            for c in range(components):
                if counts[c] > 0.0:
                    out[(row * nwidth + col) * components + c] = f32(sums[c] / counts[c])
    err.__exit__(None, None, None)
    return out


def demosaic_full(cfa, plane, width, height):
    """Scalar port of demosaic.rs:67-119. plane: [height, width] f32.
    Returns [height, width, 4] f32."""
    offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]
    lookups = np.zeros((48, 48, 9), dtype=np.int64)
    for row in range(48):
        for col in range(48):
            pixcolor = cfa.color_at(row, col)
            for i, (dy, dx) in enumerate(offsets):
                ocolor = cfa.color_at(48 + dy + row, 48 + dx + col)
                lookups[row, col, i] = ocolor if (ocolor != pixcolor or (dx == 0 and dy == 0)) else 4

    out = np.zeros((height, width, 4), dtype=f32)
    for row in range(height):
        for col in range(width):
            colors = lookups[row % 48, col % 48]
            sums = np.zeros(5, dtype=f32)
            counts = np.zeros(5, dtype=f32)
            for i, (dy, dx) in enumerate(offsets):
                y, x = row + dy, col + dx
                if 0 <= y < height and 0 <= x < width:
                    sums[colors[i]] += plane[y, x]
                    counts[colors[i]] += 1.0
            for c in range(4):
                if counts[c] > 0.0:
                    out[row, col, c] = f32(sums[c] / counts[c])
    return out
