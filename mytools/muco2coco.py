"""MuCo-3DHP annotation splitter (ref: mytools/muco2coco.py).

Splits the released MuCo-3DHP.json into augmented / unaugmented / all
subsets at sampling intervals 1 and 2 (``train_all_interv1.json`` is the
training file used by configs/das/exp_mupots.py), forcing category_id=1
and attaching the person category record.

Usage: python mytools/muco2coco.py --root data/muco
"""

import argparse
import json
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--root', default='data/muco')
    args = parser.parse_args()

    with open(os.path.join(args.root, 'annotations/MuCo-3DHP.json')) as f:
        src = json.load(f)
    images = src['images']
    anns = src['annotations']
    for ann in anns:
        ann['category_id'] = 1

    unaug = [im for im in images
             if im['file_name'].startswith('unaugmented')]
    aug = [im for im in images if im['file_name'].startswith('augmented')]
    print(f'images_unaug {len(unaug)}  images_aug {len(aug)}')

    for suffix, imgs in (('_unaug', unaug), ('_aug', aug),
                         ('_all', images)):
        for interval in (1, 2):
            sel_imgs = imgs[::interval]
            ids = {im['id'] for im in sel_imgs}
            sel_anns = [a for a in anns if a['image_id'] in ids]
            out = dict(images=sel_imgs, annotations=sel_anns,
                       categories=[dict(supercategory='person', id=1,
                                        name='person')])
            name = os.path.join(
                args.root,
                f'annotations/train{suffix}_interv{interval}.json')
            with open(name, 'w') as f:
                json.dump(out, f)
            print(name, len(sel_imgs))


if __name__ == '__main__':
    main()
