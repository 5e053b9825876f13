from ray_tracying_tpu.cli.main import main

raise SystemExit(main())
