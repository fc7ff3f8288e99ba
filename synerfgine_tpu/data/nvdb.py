"""NanoVDB (.nvdb) FloatGrid reader/writer — volume-mode ingestion.

Capability match for `Testbed::load_volume` (src/testbed_volume.cu:545-640):
the reference reads the file header + grid blob and samples it through
`nanovdb::FloatGrid` accessors on device. The TPU pipeline wants a dense
array (the volume trainer/renderer gathers from dense grids), so this
module decodes the NanoVDB tree (GridData -> TreeData -> Root -> upper
32^3 internal -> lower 16^3 internal -> 8^3 leaves) directly to numpy.

Binary layout follows NanoVDB ABI 32.3 exactly
(dependencies/nanovdb/nanovdb/NanoVDB.h: GridData @2184 672B,
TreeData @2500 64B, RootData/Tile @2686, InternalData @3042,
LeafData @3354; file header/metadata structs from
src/testbed_volume.cu:545-570). Offsets and strides below each cite the
struct they mirror. A writer for dense arrays is included (test
round-trips + lets users export volumes for the reference).
"""
from __future__ import annotations

import struct

import numpy as np

MAGIC = 0x304244566F6E614E  # "NanoVDB0" little-endian
GRID_TYPE_FLOAT = 1

# sizes (float grid, ABI 32.3)
GRIDDATA_SIZE = 672
TREEDATA_SIZE = 64
ROOT_SIZE = 64           # RootData<float>: 24 bbox + 4 tableSize + 5*4 stats -> align 32
ROOT_TILE_SIZE = 32      # key u64 + child i64 + state u32 + value f32 -> align 32
UPPER_SIZE = 8256 + (1 << 15) * 8   # header (24+8+4096+4096+16 -> 8256) + 32^3 tiles
LOWER_SIZE = 1088 + (1 << 12) * 8   # header (24+8+512+512+16 -> 1088) + 16^3 tiles
LEAF_SIZE = 96 + 512 * 4            # header (12+3+1+64+16 -> 96) + 8^3 floats
UPPER_TABLE_OFF = 8256
LOWER_TABLE_OFF = 1088
LEAF_VALUES_OFF = 96
UPPER_MASK_OFF = 32                 # after bbox(24)+flags(8)
LOWER_MASK_OFF = 32
UPPER_MASK_BYTES = 4096             # 32^3 bits
LOWER_MASK_BYTES = 512              # 16^3 bits


def _mask_bits(buf: bytes) -> np.ndarray:
    """Mask<LOG2DIM> words -> flat bool array (bit n = word[n>>6] bit n&63)."""
    words = np.frombuffer(buf, np.uint64)
    return np.unpackbits(words.view(np.uint8), bitorder="little").astype(bool)


def _offset_to_local(n: np.ndarray, log2dim: int) -> tuple:
    """InternalNode::OffsetToLocalCoord (NanoVDB.h:3230-3235): x-major."""
    m = n & ((1 << (2 * log2dim)) - 1)
    return (n >> (2 * log2dim), m >> log2dim, m & ((1 << log2dim) - 1))


def read_nvdb(path: str):
    """Parse a .nvdb file -> (dense (X, Y, Z) float32 array, info dict).

    The dense array covers the index bbox of the first grid; info carries
    origin/world bbox/voxel size for placement. Constant (tile) values
    and leaf voxels are both honored; inactive voxels read the
    background value, matching FloatGrid::getValue semantics.
    """
    with open(path, "rb") as f:
        data = f.read()
    magic, version, grid_count, codec = struct.unpack_from("<QIHH", data, 0)
    if magic != MAGIC:
        raise ValueError(f"{path}: not a nanovdb file")
    if grid_count == 0:
        raise ValueError(f"{path}: no grids")
    if codec != 0:
        raise ValueError(f"{path}: compressed nvdb unsupported")
    # NanoVDBMetaData (testbed_volume.cu:555-570), 176 bytes
    off = 16
    grid_size, _file_size, _name_key, _voxel_count = struct.unpack_from(
        "<QQQQ", data, off)
    grid_type, _grid_class = struct.unpack_from("<II", data, off + 32)
    world_bbox = struct.unpack_from("<6d", data, off + 40)
    index_bbox = struct.unpack_from("<6i", data, off + 88)
    voxel_size = struct.unpack_from("<3d", data, off + 112)
    (name_size,) = struct.unpack_from("<I", data, off + 136)
    off += 176
    name = data[off:off + name_size].split(b"\0")[0].decode()
    off += name_size
    if grid_type != GRID_TYPE_FLOAT:
        raise ValueError(f"{path}: only float grids supported "
                         f"(gridType={grid_type})")
    blob = np.frombuffer(data, np.uint8, count=grid_size, offset=off)

    lo = np.asarray(index_bbox[:3])
    hi = np.asarray(index_bbox[3:])
    shape = np.maximum(hi - lo + 1, 1)

    # tree (GridData is blob[0:672]; TreeData follows, NanoVDB.h:2500)
    tree = GRIDDATA_SIZE
    node_off = np.frombuffer(blob, np.uint64, 4, tree).astype(np.int64)
    root = tree + int(node_off[3])
    (table_size,) = struct.unpack_from("<I", blob, root + 24)
    (background,) = struct.unpack_from("<f", blob, root + 28)
    dense = np.full(tuple(shape), background, np.float32)

    def leaf_fill(leaf_off: int):
        ox, oy, oz = np.frombuffer(blob, np.int32, 3, leaf_off)  # mBBoxMin
        vmask = _mask_bits(blob[leaf_off + 16:leaf_off + 16 + 64].tobytes())
        vals = np.frombuffer(blob, np.float32, 512,
                             leaf_off + LEAF_VALUES_OFF).reshape(8, 8, 8)
        vals = np.where(vmask.reshape(8, 8, 8), vals, background)
        # leaf origin is already voxel-aligned (mBBoxMin of active voxels
        # is stored; align down to the 8-voxel tile)
        ox, oy, oz = (int(ox) & ~7, int(oy) & ~7, int(oz) & ~7)
        sx, sy, sz = ox - lo[0], oy - lo[1], oz - lo[2]
        xs = slice(max(sx, 0), min(sx + 8, shape[0]))
        ys = slice(max(sy, 0), min(sy + 8, shape[1]))
        zs = slice(max(sz, 0), min(sz + 8, shape[2]))
        dense[xs, ys, zs] = vals[xs.start - sx:xs.stop - sx,
                                 ys.start - sy:ys.stop - sy,
                                 zs.start - sz:zs.stop - sz]

    def fill_region(origin, span, value):
        s = [slice(max(int(origin[d] - lo[d]), 0),
                   min(int(origin[d] - lo[d] + span), shape[d]))
             for d in range(3)]
        dense[s[0], s[1], s[2]] = value

    def visit_lower(off_node: int, origin):
        cmask = _mask_bits(
            blob[off_node + LOWER_MASK_OFF:
                 off_node + LOWER_MASK_OFF + LOWER_MASK_BYTES].tobytes())
        vmask = _mask_bits(
            blob[off_node + LOWER_MASK_OFF + LOWER_MASK_BYTES:
                 off_node + LOWER_MASK_OFF + 2 * LOWER_MASK_BYTES].tobytes())
        table = blob[off_node + LOWER_TABLE_OFF:
                     off_node + LOWER_TABLE_OFF + (1 << 12) * 8]
        children = np.nonzero(cmask)[0]
        actives = np.nonzero(vmask & ~cmask)[0]
        vals = np.frombuffer(table, np.float32)[::2]   # union low 4 bytes
        offs = np.frombuffer(table, np.int64)
        for n in actives:   # constant active 8^3 tiles
            x, y, z = _offset_to_local(np.asarray(n), 4)
            fill_region(origin + np.asarray([x, y, z]) * 8, 8, vals[n])
        for n in children:
            leaf_fill(off_node + int(offs[n]))

    def visit_upper(off_node: int, origin):
        cmask = _mask_bits(
            blob[off_node + UPPER_MASK_OFF:
                 off_node + UPPER_MASK_OFF + UPPER_MASK_BYTES].tobytes())
        vmask = _mask_bits(
            blob[off_node + UPPER_MASK_OFF + UPPER_MASK_BYTES:
                 off_node + UPPER_MASK_OFF + 2 * UPPER_MASK_BYTES].tobytes())
        table = blob[off_node + UPPER_TABLE_OFF:
                     off_node + UPPER_TABLE_OFF + (1 << 15) * 8]
        vals = np.frombuffer(table, np.float32)[::2]
        offs = np.frombuffer(table, np.int64)
        for n in np.nonzero(vmask & ~cmask)[0]:   # constant 128^3 tiles
            x, y, z = _offset_to_local(np.asarray(n), 5)
            fill_region(origin + np.asarray([x, y, z]) * 128, 128, vals[n])
        for n in np.nonzero(cmask)[0]:
            x, y, z = _offset_to_local(np.asarray(n), 5)
            visit_lower(off_node + int(offs[n]),
                        origin + np.asarray([x, y, z]) * 128)

    # root tiles (RootData::Tile, NanoVDB.h:2727-2746): key encodes the
    # 4096-aligned origin (z low 21 bits, y mid, x high)
    tile0 = root + ROOT_SIZE
    for i in range(table_size):
        t = tile0 + i * ROOT_TILE_SIZE
        (key,) = struct.unpack_from("<Q", blob, t)
        (child,) = struct.unpack_from("<q", blob, t + 8)
        state, value = struct.unpack_from("<If", blob, t + 16)
        m = (1 << 21) - 1
        origin = np.asarray([((key >> 42) & m) << 12,
                             ((key >> 21) & m) << 12,
                             (key & m) << 12]).astype(np.int64)
        # keys store coords as uint32 >> 12; sign-extend 32-bit coords
        origin = np.where(origin >= (1 << 31), origin - (1 << 32), origin)
        if child:
            visit_upper(root + child, origin)
        elif state:
            fill_region(origin, 4096, value)

    info = {"name": name, "origin": lo, "index_bbox": (lo, hi),
            "world_bbox": (np.asarray(world_bbox[:3]),
                           np.asarray(world_bbox[3:])),
            "voxel_size": np.asarray(voxel_size),
            "background": background, "version": version}
    return dense, info


def write_nvdb(path: str, dense: np.ndarray, name: str = "density",
               voxel_size: float = 1.0, background: float = 0.0):
    """Write a dense (X, Y, Z) float32 array as an uncompressed NanoVDB
    FloatGrid (ABI 32.3 layout, single grid). Every 8^3 tile that differs
    from the background becomes a leaf; the tree is built bottom-up."""
    dense = np.asarray(dense, np.float32)
    X, Y, Z = dense.shape
    if max(X, Y, Z) > 4096:
        raise ValueError("write_nvdb supports up to 4096^3 (one root tile)")

    # pad to multiples of 8 and find non-background leaves
    pad = [(-s) % 8 for s in (X, Y, Z)]
    d = np.pad(dense, [(0, p) for p in pad], constant_values=background)
    nx, ny, nz = (s // 8 for s in d.shape)
    tiles = d.reshape(nx, 8, ny, 8, nz, 8).transpose(0, 2, 4, 1, 3, 5)
    occupied = np.argwhere(np.any(tiles != background, axis=(3, 4, 5)))

    # group leaves into lower (16^3 leaves = 128^3) and upper (32^3 lower)
    lowers: dict[tuple, list] = {}
    for (ix, iy, iz) in occupied:
        lkey = (ix // 16, iy // 16, iz // 16)
        lowers.setdefault(lkey, []).append((int(ix), int(iy), int(iz)))
    uppers: dict[tuple, list] = {}
    for lkey in lowers:
        ukey = (lkey[0] // 32, lkey[1] // 32, lkey[2] // 32)
        uppers.setdefault(ukey, []).append(lkey)

    n_leaf = len(occupied)
    n_lower = len(lowers)
    n_upper = len(uppers)
    root_tiles = len(uppers)

    tree_off = GRIDDATA_SIZE
    root_off = tree_off + TREEDATA_SIZE
    upper_off = root_off + ROOT_SIZE + root_tiles * ROOT_TILE_SIZE
    lower_off = upper_off + n_upper * UPPER_SIZE
    leaf_off = lower_off + n_lower * LOWER_SIZE
    grid_size = leaf_off + n_leaf * LEAF_SIZE

    buf = bytearray(grid_size)
    mx = float(dense.max()) if dense.size else background
    mn = float(dense.min()) if dense.size else background

    # ---- GridData (NanoVDB.h:2184; 672B)
    version = (32 << 21) | (3 << 10)
    struct.pack_into("<QQIIIIQ", buf, 0, MAGIC, 0, version, 0, 0, 1,
                     grid_size)
    nm = name.encode()[:255]
    buf[40:40 + len(nm)] = nm
    # Map (264B @296): affine double[9]+vec3 double + float mirrors; use
    # scale = voxel_size identity
    map_off = 296
    taylor = [voxel_size, 0, 0, 0, voxel_size, 0, 0, 0, voxel_size]
    inv = [1.0 / voxel_size, 0, 0, 0, 1.0 / voxel_size, 0, 0, 0,
           1.0 / voxel_size]
    struct.pack_into("<9f", buf, map_off, *taylor)
    struct.pack_into("<9f", buf, map_off + 36, *inv)
    struct.pack_into("<3f", buf, map_off + 72, 0, 0, 0)
    struct.pack_into("<9d", buf, map_off + 84, *taylor)
    struct.pack_into("<9d", buf, map_off + 156, *inv)
    struct.pack_into("<3d", buf, map_off + 228, 0, 0, 0)
    wb_off = 296 + 264
    struct.pack_into("<6d", buf, wb_off, 0, 0, 0,
                     X * voxel_size, Y * voxel_size, Z * voxel_size)
    struct.pack_into("<3d", buf, wb_off + 48, voxel_size, voxel_size,
                     voxel_size)
    struct.pack_into("<II", buf, wb_off + 72, 0, GRID_TYPE_FLOAT)

    # ---- TreeData (NanoVDB.h:2500): offsets are from the TREE start
    struct.pack_into("<4Q", buf, tree_off,
                     leaf_off - tree_off, lower_off - tree_off,
                     upper_off - tree_off, root_off - tree_off)
    struct.pack_into("<3I", buf, tree_off + 32, n_leaf, n_lower, n_upper)
    struct.pack_into("<Q", buf, tree_off + 56, int(n_leaf) * 512)

    # ---- RootData (bbox, tableSize, background/min/max stats)
    struct.pack_into("<6i", buf, root_off, 0, 0, 0, X - 1, Y - 1, Z - 1)
    struct.pack_into("<I", buf, root_off + 24, root_tiles)
    struct.pack_into("<5f", buf, root_off + 28, background, mn, mx, 0, 0)

    upper_index = {k: i for i, k in enumerate(sorted(uppers))}
    lower_index = {k: i for i, k in enumerate(sorted(lowers))}
    leaf_index = {tuple(k): i for i, k in enumerate(map(tuple, occupied))}

    for i, ukey in enumerate(sorted(uppers)):
        t = root_off + ROOT_SIZE + i * ROOT_TILE_SIZE
        key = ((ukey[0] & ((1 << 21) - 1)) << 42 |
               (ukey[1] & ((1 << 21) - 1)) << 21 |
               (ukey[2] & ((1 << 21) - 1)))
        child = (upper_off + upper_index[ukey] * UPPER_SIZE) - root_off
        struct.pack_into("<QqIf", buf, t, key, child, 0, background)

    def set_mask_bit(base, n):
        buf[base + (n >> 3)] |= 1 << (n & 7)

    for ukey, lkeys in uppers.items():
        off = upper_off + upper_index[ukey] * UPPER_SIZE
        struct.pack_into("<6i", buf, off, 0, 0, 0, 0, 0, 0)
        for lkey in lkeys:
            lx = lkey[0] - ukey[0] * 32
            ly = lkey[1] - ukey[1] * 32
            lz = lkey[2] - ukey[2] * 32
            n = (lx << 10) | (ly << 5) | lz
            set_mask_bit(off + UPPER_MASK_OFF, n)   # childMask
            child = (lower_off + lower_index[lkey] * LOWER_SIZE) - off
            struct.pack_into("<q", buf, off + UPPER_TABLE_OFF + n * 8, child)
        struct.pack_into("<4f", buf, off + UPPER_MASK_OFF
                         + 2 * UPPER_MASK_BYTES, mn, mx, 0, 0)

    for lkey, leaves in lowers.items():
        off = lower_off + lower_index[lkey] * LOWER_SIZE
        struct.pack_into("<6i", buf, off, 0, 0, 0, 0, 0, 0)
        for (ix, iy, iz) in leaves:
            lx, ly, lz = ix - lkey[0] * 16, iy - lkey[1] * 16, iz - lkey[2] * 16
            n = (lx << 8) | (ly << 4) | lz
            set_mask_bit(off + LOWER_MASK_OFF, n)
            child = (leaf_off + leaf_index[(ix, iy, iz)] * LEAF_SIZE) - off
            struct.pack_into("<q", buf, off + LOWER_TABLE_OFF + n * 8, child)
        struct.pack_into("<4f", buf, off + LOWER_MASK_OFF
                         + 2 * LOWER_MASK_BYTES, mn, mx, 0, 0)

    for (ix, iy, iz), i in leaf_index.items():
        off = leaf_off + i * LEAF_SIZE
        struct.pack_into("<3i", buf, off, ix * 8, iy * 8, iz * 8)
        buf[off + 12:off + 15] = bytes([7, 7, 7])
        buf[off + 16:off + 16 + 64] = b"\xff" * 64   # all voxels active
        vals = tiles[ix, iy, iz].astype("<f4").tobytes()
        buf[off + LEAF_VALUES_OFF:off + LEAF_VALUES_OFF + 2048] = vals

    with open(path, "wb") as f:
        f.write(struct.pack("<QIHH", MAGIC, version, 1, 0))
        meta = bytearray(176)
        struct.pack_into("<QQQQ", meta, 0, grid_size, grid_size,
                         0, int(n_leaf) * 512)
        struct.pack_into("<II", meta, 32, GRID_TYPE_FLOAT, 0)
        struct.pack_into("<6d", meta, 40, 0, 0, 0, X * voxel_size,
                         Y * voxel_size, Z * voxel_size)
        struct.pack_into("<6i", meta, 88, 0, 0, 0, X - 1, Y - 1, Z - 1)
        struct.pack_into("<3d", meta, 112, voxel_size, voxel_size, voxel_size)
        struct.pack_into("<I", meta, 136, len(nm) + 1)
        struct.pack_into("<4I", meta, 140, n_leaf, n_lower, n_upper, 1)
        struct.pack_into("<3I", meta, 156, 0, 0, 0)
        struct.pack_into("<HHI", meta, 168, 0, 0, version)
        f.write(meta)
        f.write(nm + b"\0")
        f.write(bytes(buf))
    return path
