from scal_sdt_tpu.cli.deepdanbooru_label import main

if __name__ == '__main__':
    import logging
    logging.basicConfig(level='INFO')
    main()
