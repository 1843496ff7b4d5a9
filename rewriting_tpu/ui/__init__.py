from .labwidget import (Button, Checkbox, Choice, Div, Image, Label, Model,
                        Property, Range, Textbox, Trigger, Widget)
from .paintwidget import PaintWidget
from .rewriteapp import GanRewriteApp

__all__ = ["Model", "Property", "Trigger", "Widget", "Button", "Label",
           "Textbox", "Range", "Choice", "Checkbox", "Div", "Image",
           "PaintWidget", "GanRewriteApp"]
