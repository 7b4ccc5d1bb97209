"""Dataset constant tables (reference `utils.py:26-51`)."""

# ShapeNetPart: 16 object categories, 50 parts
SEG_NUM = (4, 2, 2, 4, 4, 3, 3, 2, 4, 2, 6, 2, 3, 3, 3, 3)
INDEX_START = (0, 4, 6, 8, 12, 16, 19, 22, 24, 28, 30, 36, 38, 41, 44, 47)
PARTSEG_CATEGORIES = (
    "Airplane", "Bag", "Cap", "Car", "Chair", "Earphone", "Guitar", "Knife",
    "Lamp", "Laptop", "Motorbike", "Mug", "Pistol", "Rocket", "Skateboard",
    "Table",
)
CATEGORY2PART = {
    cat: list(range(INDEX_START[i], INDEX_START[i] + SEG_NUM[i]))
    for i, cat in enumerate(PARTSEG_CATEGORIES)
}
PART2CATEGORY = {
    part: cat for cat, parts in CATEGORY2PART.items() for part in parts
}

# Part-frequency weights recorded by the reference with an explicit warning
# ("do not use these weights, otherwise the model performance will degrade
# significantly", utils.py:27) — kept for parity, not used by any loss.
SHAPENETPART_PART_WEIGHTS = (
    0.0756, 0.0547, 0.0214, 0.0160, 0.0003, 0.0041, 0.0023, 0.0008,
    0.0028, 0.0038, 0.0085, 0.0378, 0.0742, 0.0900, 0.0466, 0.0073,
    0.0024, 0.0010, 0.0005, 0.0039, 0.0087, 0.0323, 0.0113, 0.0109,
    0.0148, 0.0537, 0.0011, 0.0204, 0.0140, 0.0122, 0.0005, 0.0004,
    0.0025, 0.0002, 7.6761e-05, 0.0071, 0.0006, 0.0098, 0.0112, 0.0049,
    0.0009, 0.0027, 0.0007, 0.0004, 0.0010, 0.0070, 0.0006, 0.2342,
    0.0727, 0.0089,
)

# S3DIS: 13 semantic classes
S3DIS_CATEGORIES = (
    "ceiling", "floor", "wall", "beam", "column", "window", "door", "table",
    "chair", "sofa", "bookcase", "board", "clutter",
)
S3DIS_OBJ_WEIGHTS = (
    0.2525, 0.2322, 0.1732, 0.0242, 0.0156, 0.0106, 0.0460, 0.0340,
    0.0533, 0.0049, 0.0329, 0.0069, 0.1138,
)
CATEGORY2LABEL = {c: i for i, c in enumerate(S3DIS_CATEGORIES)}
LABEL2CATEGORY = {i: c for i, c in enumerate(S3DIS_CATEGORIES)}
