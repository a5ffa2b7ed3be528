"""CLI entry points (reference L4/L5): attack, attack_ucf101, image_main,
image_main_ucf101, fine_tune, evaluate, evaluate_ucf101, run_grid."""
