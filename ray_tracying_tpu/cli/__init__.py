from ray_tracying_tpu.cli.main import main, parse_args
