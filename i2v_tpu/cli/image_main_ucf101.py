"""Image-guided attack CLI, UCF-101 (reference C25: image_main_ucf101.py).

Same flow as cli.image_main over the UCF-101 dataset with the
``UCF101_Image-…`` run-dir prefix (reference: image_main_ucf101.py:53-91).
"""

from __future__ import annotations

from . import image_main


def main(argv=None) -> str:
    args = image_main.arg_parse(argv, kind="UCF101_Image", default_step=10)
    if args.data == "kinetics":
        args.data = "ucf101"
    return image_main.run(args)


if __name__ == "__main__":
    main()
