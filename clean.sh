rm -r runs/*
rm -r __pycache__
